package graft

import graft.functions.MonoidAggregator
import graft.operators.{AsOfJoin, Dedup, DedupIndex, Graph, Indexing, Ingest, Multimodal, Packing, Pq, RangeJoin, Resample, Sampling, Similarity, TextAnalysis}
import graft.sources.Crawl
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with ANSI-SQL DuckDB oracle where the semantics are
  * SQL-expressible (hash/sketch internals are verified through
  * exact-similarity-verified *outputs* instead, so results stay
  * deterministic and engine-independent).
  */
object SparkEntry {

  /** Row shape for the q40 typed top-k aggregation (top-level so Spark can
    * generate its encoder).
    */
  case class Ord(o_custkey: Long, o_totalprice: Double, o_orderkey: Long)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q03(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- core --

  private def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").agg(
      round(sum("l_quantity"), 1).as("s"), count(lit(1)).as("c"))

  private def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("rev"),
        round(sum("l_quantity"), 1).as("sum_qty"),
        count(lit(1)).as("c"))
      .orderBy("l_returnflag", "l_linestatus")

  private def q03(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("tot"), count(lit(1)).as("c"))
      .orderBy("n_name")
  }

  private def q04(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")

  private def q05(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk")
  }

  private def q06(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("p"))

  private def q07(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey").as("k"))
      .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))
      .orderBy("k")

  private def q08(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("ts") >= lit("2024-01-15").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")

  private def q09(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("c"))
      .orderBy("h")

  private def q10(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      // from_json with a single-field schema, not get_json_object: the
      // JacksonParser skips non-matching fields and reuses the parser per
      // partition, where the JSON-path evaluator re-tokenizes per row.
      .groupBy((from_json(col("props"), lit("k string")).getField("k")
        .cast("long") % 10).as("kb"))
      .agg(count(lit(1)).as("c"))
      .orderBy("kb")

  private def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy("lang")
      .agg(countDistinct("source").as("ds"), sum("n_chars").as("ch"))
      .orderBy("lang")

  private def q12(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("text")
    t(s, d, "documents")
      .select(col("doc_id"), col("text"), count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") > 1)
      .select("doc_id", "text")
      .orderBy("doc_id")
  }

  private def q13(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding", Seq(0L), 1)
      .select(col("neighbor_id").as("vec_id"))

  private def q14(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(20)

  /** Reference-parity crawl (SURVEY §2.3 Q15): recursive JSON crawl of the
    * reference's own fixture tree; golden result 300 (`cmd/app/app.go:54`).
    */
  private def q15(s: SparkSession, d: String): DataFrame =
    Crawl.crawlRaw(s, "/root/reference/tests",
        StructType(Seq(StructField("data", LongType))))
      .agg(sum("data").as("s"))

  /** Typed monoid aggregation through the MonoidAggregator kernel (O3+O4). */
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = MonoidAggregator.sumDouble[Double](identity)
    t(s, d, "lineitem").select(col("l_quantity")).as[Double]
      .select(agg.column.name("sq"))
      .select(round(col("sq"), 1).as("s"))
  }

  private def q17(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 1).as("qty"), count(lit(1)).as("c"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("qty"), col("c"))
      .orderBy("rf", "ls")

  private def q18(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(round(sum("o_totalprice"), 2).as("tot"), count(lit(1)).as("c"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("tot"), col("c"))
      .orderBy("st", "pri")

  private def q19(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").cast("int").as("k"))
      .except(t(s, d, "supplier").select(col("s_nationkey").cast("int").as("k")))
      .orderBy("k")

  private def q20(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("st"),
        substring(col("o_orderpriority"), 1, 3).as("pri"),
        year(col("o_orderdate")).cast("long").as("yr"),
        // floor, not round: /100 of 2-decimal prices systematically lands on
        // .xx5 boundaries where Spark (decimal-string HALF_UP) and other
        // engines (binary) round differently; floor is binary-exact.
        floor(abs(col("o_totalprice")) / 100.0).cast("long").as("hundredths"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"))
      .orderBy("o_orderkey")
      .limit(100)

  private def q21(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("c"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("c"))
      .orderBy("ws")

  private def q22(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("ss"), col("n"))
      .orderBy("user_id", "ss")

  private def q23(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events").select("event_id", "user_id", "ts")
    val orders = t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    AsOfJoin.asof(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightVals = Seq("o_orderkey"), tieBreak = Some("o_orderkey"))
      .select("event_id", "o_orderkey")
      .orderBy("event_id")
  }

  /** Forward as-of join — the q23 fixture with direction flipped: each
    * event matched to the user's EARLIEST order at or after it (the
    * "next action after the event" query shape); ties at the matched
    * date resolve to the greatest orderkey, same convention as q23.
    */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events").select("event_id", "user_id", "ts")
    val orders = t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    AsOfJoin.asof(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightVals = Seq("o_orderkey"), tieBreak = Some("o_orderkey"),
        direction = "forward")
      .select("event_id", "o_orderkey")
      .orderBy("event_id")
  }

  /** Nearest as-of join — closer of the backward/forward matches per
    * event, exact distance ties going backward (the pandas merge_asof
    * convention). Distances compare as exact epoch seconds, so both
    * engines resolve every tie identically.
    */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events").select("event_id", "user_id", "ts")
    val orders = t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    AsOfJoin.asof(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightVals = Seq("o_orderkey"), tieBreak = Some("o_orderkey"),
        direction = "nearest")
      .select("event_id", "o_orderkey")
      .orderBy("event_id")
  }

  /** Skew-safe as-of join (segmented prefix scan over month buckets) —
    * same semantics and oracle as q23, exercising the hot-key escape
    * hatch end-to-end.
    */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events").select("event_id", "user_id", "ts")
    val orders = t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    AsOfJoin.asofBucketed(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightVals = Seq("o_orderkey"),
        bucketOf = c => date_trunc("month", c),
        tieBreak = Some("o_orderkey"))
      .select("event_id", "o_orderkey")
      .orderBy("event_id")
  }

  private def q24(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      (0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e9, "high")))
      .toDF("lo", "hi", "band")
    RangeJoin.banded(t(s, d, "events"), bands, "value", "lo", "hi")
      .groupBy("band")
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .orderBy("band")
  }

  private def q26(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("run"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private def q27(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(s, d, "events")
      .select(col("event_id"),
        round(col("value") - lag("value", 1).over(w), 2).as("dv"))
      .orderBy("event_id")
  }

  private def q25(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def q28(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(hour(col("ts")).cast("long").as("hr"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .select(col("hr") +: eventTypes.map(e => coalesce(col(e), lit(0L)).as(e)): _*)
      .orderBy("hr")

  private def q29(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
      .orderBy("o_orderstatus")

  /** Statistical aggregates: sample stddev/variance, correlation,
    * covariance — the moments a data-quality pass computes per slice.
    */
  private def q30(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_extendedprice"), 2).as("sd_price"),
        round(var_samp("l_quantity"), 2).as("var_qty"),
        round(corr("l_quantity", "l_extendedprice"), 4).as("cr"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("cv"))
      .orderBy("l_returnflag")

  /** Correlated scalar subquery — Catalyst decorrelates it into an outer
    * join + aggregate rather than executing per-row.
    */
  private def q31(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
        |    AS n_orders
        |FROM customer c ORDER BY c_custkey""".stripMargin)
  }

  /** Ordered string aggregation (listagg/string_agg shape): collect_list
    * sorted before concat so the result is deterministic under any
    * partitioning.
    */
  private def q32(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("names"),
        count(lit(1)).as("c"))
      .orderBy("r_name")

  /** SQL front door: the same declared surface through spark.sql over
    * registered views.
    */
  private def q33(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  private def q34(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, d, "documents")
      .select(
        col("doc_id"),
        size(toks).as("n_tok"),
        array_contains(toks, "spark").cast("int").as("has_spark"),
        concat_ws("|", slice(toks, 1, 3)).as("head3"),
        element_at(toks, -1).as("last_tok"),
        size(array_distinct(toks)).as("n_distinct"))
      .orderBy("doc_id")
  }

  /** Same result as q05 (top-3 orders per customer) through the bounded
    * top-k aggregator instead of a window rank — at scale the exchange
    * carries ≤ k rows per (key, partition) instead of every row.
    */
  private def q40(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Ordering.by[SparkEntry.Ord, (Double, Long)](o => (o.o_totalprice, -o.o_orderkey))
    val agg = graft.functions.TopKAggregator[SparkEntry.Ord](3, ord)
    t(s, d, "orders")
      .select("o_custkey", "o_totalprice", "o_orderkey").as[SparkEntry.Ord]
      .groupByKey(_.o_custkey)
      .agg(agg.toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col.o_orderkey").as("o_orderkey"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy("o_custkey", "rnk")
  }

  private def q35(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").cast("int").as("k"))
      .unionAll(t(s, d, "supplier").select(col("s_nationkey").cast("int").as("k")))
      .groupBy("k")
      .agg(count(lit(1)).as("c"))
      .orderBy("k")

  private def q36(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
      .orderBy("l_orderkey", "l_linenumber")

  private def q37(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        from_json(col("props"), lit("map<string,string>")).as("m"))
      .select(col("event_id"),
        // try_element_at, not element_at: under ANSI mode the latter throws
        // MAP_KEY_DOES_NOT_EXIST on a props blob without 'k', while the
        // DuckDB oracle's json_extract_string returns NULL.
        try_element_at(col("m"), lit("k")).cast("long").as("kv"),
        size(map_keys(col("m"))).as("nk"))
      .orderBy("event_id")

  private def q38(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate"))).as("mo"))
      .agg(round(sum("o_totalprice"), 2).as("tot"), count(lit(1)).as("c"))
      .orderBy("mo")

  private def q39(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(
        col("c_custkey"),
        trim(lower(col("c_name"))).as("lname"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        length(col("c_name")).as("len"),
        reverse(col("c_mktsegment")).as("rseg"))
      .orderBy("c_custkey")
      .limit(200)

  /** Argmin/argmax aggregates anchored on the unique order key (the
    * fixture has duplicate totalprices within a status group, so anchoring
    * on a non-unique column would be nondeterministic).
    */
  private def q41(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        max_by(col("o_orderdate"), col("o_orderkey")).as("latest_key_date"),
        min_by(col("o_orderdate"), col("o_orderkey")).as("first_key_date"),
        round(max("o_totalprice"), 2).as("max_price"))
      .orderBy("o_orderstatus")

  /** Conditional aggregation (FILTER clause shape): count_if + filtered
    * sum/avg in one pass over the fact table.
    */
  private def q42(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(
        expr("count_if(value > 100.0)").as("n_big"),
        round(sum(when(col("value") > 100.0, col("value"))), 2).as("v_big"),
        // sum, not avg: events.value has 2 decimals, so an average lands
        // on .xx5 round() boundaries (Spark HALF_UP vs DuckDB binary)
        round(sum(when(col("value") <= 100.0, col("value"))), 2).as("v_small"))
      .orderBy("event_type")

  /** Regex group extraction + null handling scalars. */
  private def q43(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long").as("cnum"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        when(col("c_acctbal") < 0, lit("debt")).otherwise(lit("credit")).as("standing"))
      .orderBy("c_custkey")
      .limit(300)

  /** LIKE-pattern scan + aggregation over the parts dimension. */
  private def q44(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .filter(col("p_type").like("%ECO%") || col("p_name").like("red%"))
      .groupBy("p_brand")
      // sum, not avg: an average of 2-decimal prices lands exactly on
      // .xx5 round() boundaries where Spark (decimal-string HALF_UP) and
      // DuckDB (binary) disagree; a sum of 2-decimal values never does.
      .agg(count(lit(1)).as("c"),
        round(sum("p_retailprice"), 2).as("sum_price"),
        max("p_size").cast("long").as("max_size"))
      .orderBy("p_brand")

  // --------------------------------------------------------------- dedup --











  // ---------------------------------------------------------- similarity --






  // ----------------------------------------------------------------- text --






  /** Correlated LATERAL subquery — per-order top-2 lineitems through
    * Catalyst's lateral-join decorrelation (a different planner path than
    * the window-rank form of the same question).
    */
  private def q49(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT o.o_orderkey, l.l_linenumber, l.p
        |FROM orders o,
        |LATERAL (
        |  SELECT l_linenumber, ROUND(l_extendedprice, 2) AS p
        |  FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber
        |  LIMIT 2
        |) l
        |WHERE o.o_orderkey < 200
        |ORDER BY o.o_orderkey, l.p DESC, l.l_linenumber""".stripMargin)
  }

  /** Explicit GROUPING SETS (an irregular set neither rollup nor cube
    * generates) with grouping_id disambiguating which set each row came
    * from — the last member of the grouping-analytics family.
    */
  private def q51(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q, COUNT(*) AS c
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  /** Group-aware split: the split key is the doc's SOURCE, so every doc of
    * a source lands in one split (no near-dup leakage across train/val).
    * `crossing` certifies the invariant inside the query itself — sources
    * appearing in more than one split, which must be 0.
    */
  private def q52(s: SparkSession, d: String): DataFrame = {
    val split = Sampling.hashSplit(t(s, d, "documents"), "source", 0.5)
    val perSource = split.groupBy("source")
      .agg(countDistinct(col("split")).as("nsplits"), count(lit(1)).as("ndocs"),
        min(col("split")).as("split"))
    perSource.groupBy("split")
      .agg(count(lit(1)).as("n_sources"),
        sum(col("ndocs")).as("n_docs"),
        sum(when(col("nsplits") > 1, 1L).otherwise(0L)).as("crossing"))
      .orderBy("split")
  }

  /** Per-domain cap: keep the 5 longest docs per source (doc_id breaks
    * ties), the anti-domination filter of a crawl pipeline.
    */
  private def q53(s: SparkSession, d: String): DataFrame =
    Sampling.capPerGroup(t(s, d, "documents"), "source", 5,
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select(col("source"), col("doc_id"), col("n_chars"))
      .orderBy("source", "doc_id")

  /** Daily order counts per priority, resampled onto the dense day grid of
    * the table's full span — gap days appear as explicit zeros. The day
    * serializes as an ISO string: a DATE-typed result column round-trips
    * through parquet as a python date object while the oracle side yields
    * datetime64, and the comparator treats those as unequal dtypes.
    */
  private def q54(s: SparkSession, d: String): DataFrame =
    Resample.dailyCounts(t(s, d, "orders"), "o_orderpriority", "o_orderdate")
      .select(col("o_orderpriority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"))
      .orderBy("o_orderpriority", "day")

  /** Per-user EWMA (α = 0.3) of event values in (ts, event_id) order for
    * the first 5 users. The recurrence applies identical IEEE ops in an
    * identical order in both engines, so even the unrounded doubles are
    * bit-equal; rounded to 6 for the usual display-stability reasons.
    */
  private def q77(s: SparkSession, d: String): DataFrame =
    Resample.ewma(t(s, d, "events").filter(col("user_id") < 5),
        "user_id", "ts", "value", alpha = 0.3, tieCols = Seq("event_id"))
      .select(col("user_id"), col("event_id"), round(col("ewma"), 6).as("ewma"))
      .orderBy("user_id", "event_id")

  /** Full outer join: nations' high-balance customer counts vs their
    * high-balance supplier counts; each filter leaves nations the other
    * side lacks, so both null wings are exercised. Nulls survive to the
    * output (coalesce would hide the join semantics being tested).
    */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer").filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val supp = t(s, d, "supplier").filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    cust.join(supp, Seq("nk"), "full_outer")
      .select(col("nk").cast("int").as("nk"), col("n_cust"), col("n_supp"))
      .orderBy("nk")
  }


  /** Time-RANGE window frame (not ROWS): per user, how many events and how
    * much floor(value) landed in the trailing hour of each event. The
    * trailing-window rate signal; integer-exact aggregates (count +
    * floored sum) so frame-internal summation order cannot matter. The
    * oracle must FLOOR(epoch(ts)) — a bare CAST to BIGINT rounds
    * half-up there, while `unix_timestamp` floors, and a 1-second uts
    * disagreement shifts frame membership at the 3600 s boundary.
    */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("uts"))
      .rangeBetween(-3600L, 0L)
    t(s, d, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("uts"), col("value"))
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(floor(col("value")).cast("long")).over(w).as("f_1h"))
      .orderBy("event_id")
  }

  /** Stratified downsample: keep half the dominant language, a quarter of
    * everything else; per-lang survivor stats. The oracle re-derives the
    * per-stratum keep rule from md5 hex prefixes ('8' = 0.5, '4' = 0.25
    * of the keyspace).
    */
  private def q57(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(t(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.5), defaultFrac = 0.25)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .orderBy("lang")

  /** Per-label embedding centroids in tall (label, idx) form — the class-
    * centroid aggregation of a quantizer/cluster-summary pipeline.
    */
  private def q58(s: SparkSession, d: String): DataFrame =
    Similarity.labelCentroids(t(s, d, "embeddings"), "label", "embedding")
      .select(col("label"), col("idx"),
        round(col("mean"), 6).as("mean"), col("n"))
      .orderBy("label", "idx")

  /** Deterministic MODE: most frequent quantity per return flag. Native
    * `mode()` leaves ties engine-defined, so the query derives it from
    * counts with an explicit (count desc, value asc) tie-break — the only
    * form two engines can agree on.
    */
  private def q59(s: SparkSession, d: String): DataFrame = {
    val counts = t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_returnflag", "q").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("c").desc, col("q").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("q").as("mode_qty"), col("c").as("n"))
      .orderBy("l_returnflag")
  }

  /** Equal-width histogram of order totals (50k buckets): bucket id from
    * floor division — no bucket-boundary function needed, identical
    * arithmetic in any engine.
    */
  private def q60(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy("bucket")

  /** Int8 scalar quantization of the embedding corpus: per-dimension code
    * range, reconstruction MSE and worst-case error — the compression
    * quality report of an ANN index build. floor-binning keeps every
    * arithmetic step engine-identical; MSE rounds at 1e-8 (summation-order
    * noise is ~1e-18).
    */
  /** Per-dimension z-score standardization: the first 5 vectors' full
    * standardized values (rounded) pin the corpus mean/std of every
    * dimension and the narrow rebuild-by-index projection.
    */
  private def q75(s: SparkSession, d: String): DataFrame =
    Similarity.standardize(t(s, d, "embeddings"), "vec_id", "embedding")
      .filter(col("vid") < 5)
      .select(col("vid").as("vec_id"),
        posexplode(col("zvec")).as(Seq("idx", "z")))
      .select(col("vec_id"), col("idx"), round(col("z"), 4).as("z"))
      .orderBy("vec_id", "idx")

  private def q61(s: SparkSession, d: String): DataFrame = {
    val levels = 256
    val codes = Similarity.scalarQuantize(t(s, d, "embeddings"), "vec_id", "embedding", levels)
    val deq = col("lo") + (col("code") + lit(0.5)) * (col("hi") - col("lo")) / lit(levels.toDouble)
    codes.select(col("idx"), col("lo"), col("hi"), col("code"),
        (col("v") - deq).as("err"))
      .groupBy("idx")
      .agg(round(min(col("lo")), 6).as("lo"), round(max(col("hi")), 6).as("hi"),
        round(avg(col("err") * col("err")), 8).as("mse"),
        round(max(abs(col("err"))), 6).as("max_abs_err"),
        countDistinct(col("code")).as("n_codes"))
      .orderBy("idx")
  }

  /** Concat-and-chunk sequence packing stats: documents sharded by
    * `doc_id % 8`, concatenated in doc_id order, cut every 512 tokens —
    * how full the training sequences are and how many docs straddle a
    * boundary. See [[graft.operators.Packing.chunkStats]].
    */
  private def q62(s: SparkSession, d: String): DataFrame =
    Packing.chunkStats(t(s, d, "documents"), "doc_id", "text",
        nShards = 8, seqLen = 512)
      .orderBy("shard")

  /** Next-fit bin packing stats: same shards, but documents are never
    * split — one that does not fit the current 512-token bin starts a new
    * bin. See [[graft.operators.Packing.nextFitStats]]; oracle replays the
    * same sequential walk as a recursive CTE.
    */
  private def q63(s: SparkSession, d: String): DataFrame =
    Packing.nextFitStats(t(s, d, "documents"), "doc_id", "text",
        nShards = 8, capacity = 512)
      .orderBy("shard")

  /** Latest-wins corpus upsert: a corrected re-crawl batch (even order
    * keys, totalprice bumped) merged into the base corpus (keys not
    * divisible by 3) — batch rows win on key collision, untouched base
    * rows survive. Aggregated per priority so the compare is compact while
    * still pinning every merged row's provenance through the sums.
    */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val base = o.filter(col("o_orderkey") % 3 =!= 0)
    val batch = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
    Ingest.upsert(base, batch, Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
      .orderBy("o_orderpriority")
  }

  /** PageRank over a deterministic 40-node link graph derived from orders
    * (src = custkey % 40, dst = orderkey % 40): 3 damped rounds, dangling
    * mass dropped. The oracle replays the identical recurrence as chained
    * CTEs, so every join/aggregate round of [[graft.operators.Graph]] is
    * hash-checked.
    */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val edges = t(s, d, "orders").select(
      (col("o_custkey") % 40).as("src"), (col("o_orderkey") % 40).as("dst"))
    Graph.pageRank(edges, "src", "dst", iterations = 3, damping = 0.85)
      .select(col("v"), round(col("pr"), 6).as("pr"))
      .orderBy("v")
  }

  /** Per-node triangle counts over a 500-node link graph from orders
    * (sparser than q65's 40-node one, so counts vary 85–289 instead of
    * collapsing to the complete-graph constant). The operator orients
    * edges by (degree, id) rank; the oracle does the textbook a<b<c
    * three-way self-join — identical triangle SET either way, so the hash
    * compare certifies the orientation trick is result-transparent.
    */
  private def q66(s: SparkSession, d: String): DataFrame = {
    val edges = t(s, d, "orders").select(
      (col("o_custkey") % 500).as("src"), (col("o_orderkey") % 500).as("dst"))
    Graph.triangleCounts(edges, "src", "dst").orderBy("v")
  }

  /** SCD2 change history of each sampled user's event_type: one validity
    * interval per consecutive-type run, closed by the next change
    * (epoch-micros endpoints; open interval = null). event_id rides along
    * as the in-timestamp tie-break and makes the row order unique.
    */
  private def q67(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("user_id") % 50 === 0)
    Ingest.changeHistory(ev, Seq("user_id"), "ts",
        Seq("event_id"), Seq("event_type"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("effective_from")).as("ef"),
        unix_micros(col("effective_to")).as("et"))
      .orderBy("user_id", "ef", "event_id")
  }

  /** Point-in-time enrichment of an hourly probe grid against the q67
    * SCD2 dimension: for every sampled user and every hour of their
    * activity span, the event_type version live at that instant (null
    * before the first version) — [[Ingest.pointInTime]]: an as-of
    * backward join plus the gap check, never an interval join. `ver` is
    * the version-opening event_id, pinning WHICH version matched, not
    * just its attribute value.
    */
  private def qScd2Pit(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("user_id") % 50 === 0)
    val dim = Ingest.changeHistory(ev, Seq("user_id"), "ts",
      Seq("event_id"), Seq("event_type"))
    val grid = ev.groupBy("user_id").agg(min("ts").as("lo"), max("ts").as("hi"))
      .select(col("user_id"), explode(sequence(
        date_trunc("hour", col("lo")), col("hi"),
        expr("interval 1 hour"))).as("at"))
    Ingest.pointInTime(grid, dim, "user_id", "at",
        Seq("event_type", "event_id"), tieBreak = Some("event_id"))
      .select(col("user_id"), unix_timestamp(col("at")).as("at_s"),
        col("event_type"), col("event_id").as("ver"))
      .orderBy("user_id", "at_s")
  }

  /** Vocabulary build (top-20 tokens by count, rank-assigned ids — the
    * fixture corpus has 31 distinct tokens, so ~1/3 of the stream is OOV
    * and the 0-mapping path is genuinely exercised) + document encoding to
    * id sequences, scalarized per doc as (length, oov count, id sum) so
    * the compare pins every token's id through the sums without shipping
    * arrays.
    */
  private def q68(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val vocab = TextAnalysis.buildVocab(docs, "text", 20)
    TextAnalysis.encode(docs, "doc_id", "text", vocab)
      .select(col("doc_id"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(filter(col("ids"), x => x === 0)).cast("long").as("n_oov"),
        aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
      .orderBy("doc_id")
  }

  /** Per-source winsorization of document length at the 0.9 order
    * statistic: the cap value, how many docs were clipped, and the clipped
    * total — all integer-exact because the cap is a rank-selected element,
    * never an interpolated quantile.
    */
  private def q69(s: SparkSession, d: String): DataFrame =
    Sampling.winsorize(t(s, d, "documents"), Seq("source"), "n_chars", 0.9)
      .groupBy("source")
      .agg(max(col("cap")).as("cap"),
        sum(when(col("n_chars") > col("cap"), 1L).otherwise(0L)).as("n_capped"),
        sum(col("winsorized")).as("tot"))
      .orderBy("source")

  /** Contiguous global ids over documents in (source, doc_id) order — the
    * range-shuffle + zipWithIndex two-pass, never a single-partition
    * window. The oracle is the definitionally-equivalent
    * row_number()−1 over the same total order.
    */
  private def q70(s: SparkSession, d: String): DataFrame =
    Indexing.globalIds(t(s, d, "documents"), Seq("source", "doc_id"))
      .select(col("source"), col("doc_id"), col("gid"))
      .orderBy("gid")

  /** Order-independent per-source content digest of the documents table —
    * the anti-entropy checksum two corpus replicas compare. Row order,
    * partitioning, and engine are all invisible to the sum-of-md5-prefix
    * digest, so Spark and DuckDB agree exactly.
    */
  private def q71(s: SparkSession, d: String): DataFrame =
    Ingest.tableDigest(t(s, d, "documents"), Seq("source"), Seq("doc_id", "text"))
      .orderBy("source")

  /** Column-level profile of the documents table: row/null/distinct counts
    * and min/max per column — the ingestion-validation report. Restricted
    * to int/string columns so the stringified min/max render identically
    * across engines.
    */
  private def q72(s: SparkSession, d: String): DataFrame =
    Ingest.profile(t(s, d, "documents"), Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("col_name")

  /** Quality-weighted importance sampling of documents: keep probability
    * proportional to length (n_chars/600, clamped) — per-source kept
    * counts plus the kept-id sum pin the exact kept SET, not just its
    * size, certifying the md5-threshold decision end to end.
    */
  private def q74(s: SparkSession, d: String): DataFrame =
    Sampling.importanceSample(
        t(s, d, "documents")
          .withColumn("p", col("n_chars").cast("double") / 600.0),
        "doc_id", "p")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      .orderBy("source")

  /** Deterministic negative sampling over the dense embedding id space:
    * 4 negatives per anchor for the first 20 vectors — every drawn id is
    * pinned, certifying the hash draw and the anchor-collision fix-up.
    */
  private def q84(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "embeddings").count()
    Sampling.negativeSamples(
        t(s, d, "embeddings").filter(col("vec_id") < 20).select("vec_id"),
        "vec_id", n, k = 4)
      .orderBy("vec_id", "neg_idx")
  }

  /** Star-schema join (the TPC-H Q5 shape): fact lineitem through orders
    * → customer → nation → region with a selective region filter —
    * certifies Catalyst's join ordering and automatic broadcast of the
    * small dimensions on a 4-join chain.
    */
  private def q81(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("rev"), count(lit(1)).as("c"))
      .orderBy("n_name")

  /** Gaps-and-islands: longest consecutive-day purchase streak per user
    * (rn-difference anchor grouping). Integer day arithmetic, so the
    * island boundaries are engine-exact.
    */
  private def q82(s: SparkSession, d: String): DataFrame = {
    val days = t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("anchor",
        date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("streak"), count(lit(1)).as("n_islands"),
        sum(col("len")).as("n_days"))
      .orderBy("user_id")
  }

  /** CDC apply: lineitem rows act as a change log over orders (latest
    * (l_shipdate, l_linenumber) per order wins; every 4th linenumber is a
    * delete), merged into the orders snapshot. Per-bucket counts and
    * value sums pin the net-effect pick, the delete filter, and the
    * pass-through of untouched keys. The synthetic lineitem duplicates a
    * few (orderkey, shipdate, linenumber) triples, so the payload columns
    * join the tie-break to make the latest-change pick engine-unique.
    */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("v"))
    val changes = t(s, d, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_returnflag").as("status"),
        col("l_extendedprice").as("v"), col("l_shipdate").as("ts"),
        col("l_linenumber").as("tie"),
        when(col("l_linenumber") % 4 === 0, lit("delete"))
          .otherwise(lit("upsert")).as("op"))
    Ingest.applyChanges(base, changes, Seq("k"), "ts", "op",
        Seq("tie", "v", "status"))
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("v"))
      .orderBy("bucket")
  }

  /** Batch sessionization (30-minute gap) with the session id on every
    * row; per-session event counts and integer second spans pin both the
    * boundary rule and the running session index.
    */
  private def q79(s: SparkSession, d: String): DataFrame =
    Resample.sessionize(t(s, d, "events"), "user_id", "ts",
        gapSeconds = 1800, tieCols = Seq("event_id"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
          .as("dur_s"))
      .orderBy("user_id", "session_idx")

  /** Session funnel: per user, how many 30-minute sessions exist and how
    * many convert (a purchase at-or-after the session's first click, at
    * second precision — engine-consistent on both sides). Composes
    * [[Resample.sessionize]] with a conditional-aggregation rollup:
    * certifies the session ids are usable as join/group keys, not just
    * labels.
    */
  private def q83(s: SparkSession, d: String): DataFrame =
    Resample.sessionize(t(s, d, "events"), "user_id", "ts",
        gapSeconds = 1800, tieCols = Seq("event_id"))
      .groupBy("user_id", "session_idx")
      .agg(
        min(when(col("event_type") === "click",
          unix_timestamp(col("ts")))).as("fc"),
        max(when(col("event_type") === "purchase",
          unix_timestamp(col("ts")))).as("lp"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("fc").isNotNull && col("lp").isNotNull &&
          col("lp") >= col("fc"), lit(1))).as("n_converted"))
      .orderBy("user_id")

  /** URL parsing (the crawl-normalization workhorse): synthesize a URL
    * per document from fixture columns, then recover host / path / one
    * query parameter with `parse_url` — certified against the oracle's
    * independent string construction.
    */
  private def q80(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id").cast("string"), lit("?lang="), col("lang")).as("url"))
      .select(col("doc_id"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang"))
      .groupBy("host", "lang")
      .agg(count(lit(1)).as("n"), min(col("path")).as("p0"))
      .orderBy("host", "lang")

  /** Weighted sampling without replacement (A-ES): 5 docs per source with
    * inclusion probability ∝ n_chars. The exact kept id set per source
    * certifies the priority computation, the rounding guard, and the
    * group-limited rank cut.
    */
  private def q76(s: SparkSession, d: String): DataFrame =
    Sampling.weightedSample(t(s, d, "documents"), "doc_id", "n_chars",
        Seq("source"), k = 5)
      .select(col("source"), col("doc_id"))
      .orderBy("source", "doc_id")

  /** Snapshot diff between two derived versions of orders (drop-%3 with a
    * price bump on even keys, vs drop-%7): every status class — added /
    * removed / changed / unchanged — is populated, and the per-status
    * counts pin the full-outer classification.
    */
  private def q73(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("p"),
        col("o_totalprice").as("v"))
    val before = o.filter(col("k") % 7 =!= 0)
    val after = o.filter(col("k") % 3 =!= 0)
      .withColumn("v", when(col("k") % 2 === 0, col("v") + 1).otherwise(col("v")))
    Ingest.diff(before, after, Seq("k"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }








  /** Unpivot (melt) three measure columns into (metric, value) rows and
    * re-aggregate — the wide-to-long reshape. The oracle expresses the
    * same reshape as a UNION ALL of projections, which is what unpivot
    * desugars to in any engine.
    */
  private def q50(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_discount").cast("double").as("l_discount"),
        col("l_tax").cast("double").as("l_tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy("metric")
      .agg(round(sum(col("value")), 2).as("sv"), count(lit(1)).as("c"))
      .orderBy("metric")

  /** Distribution window functions in one pass — ntile, percent_rank,
    * cume_dist, nth_value over a per-segment price ordering. Ordering is
    * made total (acctbal desc, custkey) so every rank function is
    * deterministic; ratios round to 6 (see the small-int rounding rule).
    */
  private def q48(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, d, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        nth_value(col("c_custkey"), 2).over(
          w.rowsBetween(W.unboundedPreceding, W.currentRow)).as("second_top"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Deterministic hash split at 0.75: counts and key ranges per split.
    * The oracle re-derives the split by comparing the md5 hex string
    * lexicographically ('c' = 0.75 of the keyspace) — hex-char order is
    * ASCII order, so the two predicates are exactly equivalent.
    */
  private def q46(s: SparkSession, d: String): DataFrame =
    Sampling.hashSplit(t(s, d, "documents"), "doc_id", 0.75)
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .orderBy("split")






  /** The flagship training-corpus prep pipeline, composed from the
    * library's own operators: language-ID filter (native LangId kernel) →
    * integer-exact quality gate (n_tokens ≥ 10) → exact dedup (min-id
    * survivor per text) → deterministic hash split → per-split stats.
    * Every stage is an operator that is also oracle-certified in
    * isolation; this query certifies their composition. All filters are
    * engine-exact (string equality, integer compares, md5) so the oracle
    * keep-set is bit-identical.
    */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val enriched = docs.select(
      Seq(col("doc_id"), col("text"),
        TextAnalysis.langId(col("text")).as("lang")) ++
        TextAnalysis.qualityColumns(col("text")): _*)
    val filtered = enriched.filter(col("lang") === "en" && col("n_tokens") >= 10)
    val survivors = Dedup.exact(filtered, "doc_id", Seq("text", "quality_score"))
    Sampling.hashSplit(survivors, "doc_id", 0.75)
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
        round(avg(col("quality_score")), 3).as("avg_q"))
      .orderBy("split")
  }


  // ----------------------------------------------------------- multimodal --


  // ------------------------------------------------------------ streaming --








  /** HLL sketch cardinality — implementation-specific, rows-only check in
    * the driver gate; SketchSpec bounds it within ±2% of exact. rsd=0.01
    * (vs the 0.05 default) — a few KB more sketch for percent-level error,
    * the right trade anywhere near 100 TB cardinalities.
    */
  private def qHll(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  /** Time-series subsequence search: the query pattern is user 0's
    * first 8 values; the 15 nearest z-normalized windows across every
    * user's value series. Both engines assemble the series in the same
    * deterministic (ts, event_id) order and compute the same
    * population-std z-norm, distances rounded to 6 decimals with a
    * (user, off) tie-break.
    */
  private def qSeriesTopk(s: SparkSession, d: String): DataFrame = {
    val series = operators.SeriesSearch.seriesOf(
      t(s, d, "events"), "user_id", Seq("ts", "event_id"), "value")
    val q = series.filter(col("user_id") === 0)
      .head().getSeq[Double](1).take(8).toArray
    operators.SeriesSearch.topK(series, "user_id", q, 15)
  }

  /** Heavy hitters AT REST — the top-k twin of q_hll_merge: per-(day,
    * event_type) Misra–Gries slice summaries of the user column, rolled
    * up to per-type summaries by the mergeable-summaries merge, top-10
    * emitted. At full counter capacity (k=4096 ≫ distinct users) the
    * summary IS the exact count table — the nprobe=all ⇒ exact
    * precedent — so the oracle is the plain GROUP BY ranking;
    * SketchesSpec pins the lossy-regime MG bounds.
    */
  private def qMgTopk(s: SparkSession, d: String): DataFrame = {
    val slices = operators.Sketches.mgByGroup(
      t(s, d, "events").select(to_date(col("ts")).as("day"),
        col("event_type"), col("user_id")),
      Seq("day", "event_type"), "user_id", k = 4096)
    val rolled = operators.Sketches.mgRollup(slices, Seq("event_type"),
      "user_id", k = 4096)
    val w = Window.partitionBy("event_type")
      .orderBy(col("mg_count").desc, col("user_id"))
    rolled.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select(col("event_type"), col("rnk"), col("user_id"),
        col("mg_count").as("c"))
      .orderBy("event_type", "rnk")
  }

  /** Incrementally maintained aggregate: build on the first slice of the
    * corpus, fold two more batches in through the ledgered monoid merge
    * (one of them REDELIVERED — the ledger must absorb it), read the
    * served state. Counts/sums/mins/maxes over integral columns fold
    * exactly, so the oracle is the one-shot GROUP BY over everything —
    * the equality that certifies a 100 TB dashboard aggregate can refresh
    * per batch without ever re-scanning the corpus.
    */
  private def qIncrAgg(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft_magg").toString
    val m = operators.MaterializedAgg.build(
      docs.filter(col("doc_id") < 150), Seq("lang", "source"),
      Seq("n_chars"), base)
    m.update(docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), 0L)
    m.update(docs.filter(col("doc_id") >= 300), 1L)
    m.update(docs.filter(col("doc_id") >= 300), 1L) // redelivery: no-op
    m.read().select(col("lang"), col("source"), col("n"),
        col("s_n_chars").as("s"), col("mn_n_chars").as("mn"),
        col("mx_n_chars").as("mx"))
      .orderBy("lang", "source")
  }

  /** Sketches AT REST: per-(returnflag, linestatus) HLL slice sketches
    * of the part key, rolled up to per-returnflag estimates by LOSSLESS
    * merge — the raw table is scanned once to build the slices and
    * never again; any rollup reads sketch rows. Rows-only (DataSketches
    * register estimates have no SQL oracle); SketchesSpec pins the
    * error envelope and the rolled-up == direct equality.
    */
  private def qHllMerge(s: SparkSession, d: String): DataFrame =
    operators.Sketches.hllRollup(
      operators.Sketches.hllByGroup(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), "l_partkey"),
      Seq("l_returnflag"))
      .orderBy("l_returnflag")

  /** Zone-map-pruned scan: events laid out range-partitioned by `value`
    * into 8 files, per-file (min, max, nulls) zones built over
    * (value, user_id) at metadata scale (one tiny row per file), then a
    * selective value band answered by reading ONLY the files whose zone
    * can intersect it, with the exact predicate re-applied on read.
    * Pruning is conservative, so the result equals the plain filtered
    * scan — the oracle; ZoneMapSpec pins that the pruned plan really
    * reads fewer files and survives stale/missing-index states.
    */
  private def qZonemapScan(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_zm").toString
    val (data, idx) = (s"$base/data", s"$base/zones")
    t(s, d, "events").select("event_id", "user_id", "event_type", "value")
      .repartitionByRange(8, col("value")).sortWithinPartitions("value")
      .write.parquet(data)
    operators.ZoneMap.build(s, data, Seq("value", "user_id"), idx)
    operators.ZoneMap.scan(s, data, idx,
        Seq(operators.ZoneMap.Range("value", 100.0, 200.0)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** Zone-map maintenance cycle: build zones over the first half of
    * events, land the second half as NEW files, then `append` indexes
    * exactly the late files (idempotent — the second call is a no-op)
    * and the pruned scan covers both generations. The staleness window
    * in between only widens the read (unindexed files join the plan
    * unpruned), so correctness never depends on the index being caught
    * up — the property that lets a 100 TB table index lag its ingest.
    */
  private def qZonemapMaintain(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_zm2").toString
    val (data, idx) = (s"$base/data", s"$base/zones")
    val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
    ev.filter(col("event_id") % 2 === 0)
      .repartitionByRange(4, col("user_id")).sortWithinPartitions("user_id")
      .write.parquet(data)
    operators.ZoneMap.build(s, data, Seq("user_id"), idx)
    ev.filter(col("event_id") % 2 === 1)
      .repartitionByRange(4, col("user_id")).sortWithinPartitions("user_id")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(data)
    require(operators.ZoneMap.append(s, data, idx) >= 1,
      "late files must be indexed")
    require(operators.ZoneMap.append(s, data, idx) == 0,
      "append must be idempotent")
    operators.ZoneMap.scan(s, data, idx,
        Seq(operators.ZoneMap.Range("user_id", 10L, 40L)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("user_id")
  }

  /** Z-order relayout composed with zone maps: events rewritten along
    * the (value, user_id) Morton curve into 8 files, zones built over
    * both columns, then a TWO-column band scanned through the pruned
    * file list. A linear sort would make only its leading column
    * prunable; the interleaved layout keeps per-file ranges narrow in
    * BOTH, which is the whole point (LayoutSpec pins the pruning-power
    * gap). The relayout is row-preserving and pruning conservative, so
    * the oracle is the plain two-predicate filter.
    */
  private def qLayoutZorder(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_zord").toString
    val (data, idx) = (s"$base/data", s"$base/zones")
    val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
    operators.Layout.rewrite(ev, Seq("value", "user_id"), data, nFiles = 8)
    operators.ZoneMap.build(s, data, Seq("value", "user_id"), idx)
    operators.ZoneMap.scan(s, data, idx, Seq(
        operators.ZoneMap.Range("value", 200.0, 600.0),
        operators.ZoneMap.Range("user_id", 5L, 25L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** The Morton key itself, bit-exact across engines: bucket =
    * clamp(floor((v − min) / (max − min) · 2^16)) per column, bits
    * interleaved value-then-user_id. Both engines run the identical
    * IEEE-double expression (same operation order), so the oracle — the
    * same arithmetic spelled as generated SQL — must hash-match exactly,
    * certifying that a relayout computed by this engine and one computed
    * by any SQL engine sharing the formula produce the same curve.
    */
  private def qZorderKey(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select("event_id", "user_id", "value")
    val stats = operators.Layout.colStats(ev, Seq("value", "user_id"))
    ev.withColumn("zkey",
        operators.Layout.zkey(Seq("value", "user_id"), stats, bits = 16))
      .select("event_id", "zkey")
      .orderBy("event_id")
  }

  /** Moments sketch at rest — the exactly-mergeable sibling of
    * q_hll_merge, and the one sketch whose rollup carries a full SQL
    * oracle: documents sliced per (lang, source) into constant-size
    * (n, Σv, Σv², min, max, fixed-domain histogram) rows, rolled up to
    * per-lang stats by pure addition. n_chars is integral, so every sum
    * is an exact double and slice→rollup equals the direct computation
    * BIT-exactly — mean/variance included, no rounding needed.
    */
  private def qMoments(s: SparkSession, d: String): DataFrame = {
    val slices = operators.Sketches.momentsByGroup(
      t(s, d, "documents"), Seq("lang", "source"), "n_chars", 0.0, 2000.0, 8)
    operators.Sketches.momentsStats(
        operators.Sketches.momentsRollup(slices, Seq("lang"), 8))
      .select(col("lang"), col("n"),
        col("s").cast("long").as("s"), col("s2").cast("long").as("s2"),
        col("mn").cast("long").as("mn"), col("mx").cast("long").as("mx"),
        col("mean"), col("variance"),
        element_at(col("hist"), 1).as("h_under"),
        element_at(col("hist"), 2).as("h1"),
        element_at(col("hist"), 5).as("h4"),
        element_at(col("hist"), 10).as("h_over"))
      .orderBy("lang")
  }

  /** Small-file compaction as the streaming sink's maintenance leg:
    * events landed as 50 hash-scattered files (an append-per-micro-batch
    * table a week in), the trigger confirms fragmentation, and the
    * rewrite folds them into ~4 files RE-SORTED by user_id — restoring
    * the zone-map pruning interleaved appends destroyed. The scan then
    * goes through the fresh index. Compaction is a pure relayout and
    * pruning conservative, so the oracle is the plain filtered agg.
    */
  private def qCompact(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
    ev.repartition(50).write.parquet(s"$base/frag")
    require(operators.Compaction.needsCompaction(s, s"$base/frag",
      targetRows = 3000), "50 scattered files must trip the trigger")
    val (before, after, _) = operators.Compaction.compactTo(
      s, s"$base/frag", s"$base/data", targetRows = 3000,
      sortCols = Seq("user_id"))
    require(after < before, s"compaction must shrink the file count: $before -> $after")
    operators.ZoneMap.build(s, s"$base/data", Seq("user_id"), s"$base/zones")
    operators.ZoneMap.scan(s, s"$base/data", s"$base/zones",
        Seq(operators.ZoneMap.Range("user_id", 50L, 80L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** Per-file bloom pruning for point lookups: events landed
    * ROUND-ROBIN (every file spans the full id range — min/max zones
    * keep all 16 files, the layout blooms exist for), blooms built on
    * event_id, then a single-key lookup plans ~1 file. Blooms have no
    * false negatives and the exact predicate re-applies on read, so the
    * oracle is the plain equality filter.
    */
  private def qBloommap(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val (data, idx) = (s"$base/data", s"$base/zones")
    t(s, d, "events").select("event_id", "user_id", "event_type", "value")
      .repartition(16).write.parquet(data)
    operators.ZoneMap.build(s, data, Seq("event_id"), idx,
      bloomCols = Seq("event_id"), bloomItems = 100000L, bloomFpp = 0.01)
    val kept = operators.ZoneMap.prunedFiles(s, data, idx,
      Seq(operators.ZoneMap.Point("event_id", 123L))).get
    require(kept.size <= 4, s"bloom must prune the scattered layout: ${kept.size}")
    operators.ZoneMap.scan(s, data, idx,
        Seq(operators.ZoneMap.Point("event_id", 123L)))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** The end-to-end training-data pipeline, composed from the shipped
    * operators and pinned by ONE oracle: quality gate → exact dedup
    * (min-id survivor) → temperature-flattened language mixing (α=0.5)
    * → contiguous global ids in doc order → rendezvous sharding, rolled
    * up per shard over exact integer sums (membership via id_sum,
    * ordering via gid_sum). Every stage is deterministic and
    * hash-reproducible (md5 weights, rounded rates, unique sort keys),
    * so the whole composition replays as one DuckDB CTE chain — the
    * "switch your pipeline to this library" demonstration in a single
    * query.
    */
  private def qPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val clean = docs.filter(col("n_chars") >= 150)
    val survivors = clean.join(
      operators.Dedup.exact(clean, "doc_id", Seq("text")).select("doc_id"),
      Seq("doc_id"))
    val mixed = operators.Sampling.temperatureSample(
      survivors, "lang", "doc_id", 0.5)
    val ids = operators.Indexing.globalIds(
      mixed.select("doc_id", "lang"), Seq("doc_id"))
    operators.Indexing.rendezvousShard(ids, "doc_id", 4)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"),
        sum("gid").as("gid_sum"))
      .orderBy("shard")
  }

  /** KLL/GK-style quantile sketch — implementation-specific, rows-only. */
  private def qApproxQuantile(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(expr("percentile_approx(l_extendedprice, 0.5, 1000)"), 2).as("p50"))
      .orderBy("l_returnflag")


  /** Temperature-flattened language mixing (α = 0.5) over the skewed
    * `lang` column: per-language kept counts, kept-id sums (pinning the
    * exact kept set), and the realized keep rate.
    */
  private def q85(s: SparkSession, d: String): DataFrame =
    Sampling.temperatureSample(t(s, d, "documents"), "lang", "doc_id", alpha = 0.5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"),
        max("rate").as("rate"))
      .orderBy("lang")

  /** Token-budget trim: keep documents in (n_chars desc, doc_id) order
    * while the inclusive running character total stays ≤ 75k — the
    * "best docs until the budget is spent" selection, grouped per source.
    * Integer arithmetic end to end, so the cut is engine-exact.
    */
  private def q86(s: SparkSession, d: String): DataFrame =
    Sampling.budgetTrim(t(s, d, "documents"),
        Seq(col("n_chars").desc, col("doc_id")), "n_chars", budget = 75000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"),
        sum("n_chars").as("chars"))
      .orderBy("source")

  /** Robust MAD outliers on event values per type (k = 3): the group
    * median/MAD (rank-selected order statistics, engine-exact) plus
    * outlier counts and flagged-id sums pinning the exact flag set.
    */
  private def q87(s: SparkSession, d: String): DataFrame =
    Ingest.madOutliers(t(s, d, "events"), Seq("event_type"), "value", k = 3.0)
      .groupBy("event_type")
      .agg(round(max("med"), 6).as("med"), round(max("mad"), 6).as("mad"),
        count(when(col("is_outlier"), lit(1))).as("n_out"),
        sum(when(col("is_outlier"), col("event_id"))).as("out_ids"))
      .orderBy("event_type")

  /** Bucketed interval-overlap self-join: per-user event intervals
    * [ts, ts + floor(value)] in epoch seconds, all overlapping pairs via
    * the equi-join bucket grid (width 600 s ≥ the max span, so fan-out
    * ≤ 2 buckets/interval), aggregated to per-user pair counts + id-sum
    * checksums. The oracle replays the plain theta self-join.
    */
  private def q88(s: SparkSession, d: String): DataFrame = {
    val iv = t(s, d, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("lo"),
      (unix_timestamp(col("ts")) + floor(col("value")).cast("long")).as("hi"))
    RangeJoin.intervalOverlap(iv, iv, Seq("user_id"), "lo", "hi",
        bucketWidth = 600L)
      .filter(col("l_event_id") < col("r_event_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_event_id") + col("r_event_id")).as("pair_sum"))
      .orderBy("user_id")
  }

  /** Fuzzy (edit-distance ≤ 2) self-join over the 64 distinct part names
    * (id = min partkey per name): every near-identical name pair with its
    * exact distance, generated by q-gram prefix filtering and verified
    * with levenshtein — the oracle replays the naive theta join.
    */
  private def q89(s: SparkSession, d: String): DataFrame = {
    val names = t(s, d, "part").groupBy(col("p_name").as("nm"))
      .agg(min("p_partkey").as("id"))
    graft.operators.FuzzyJoin.editDistanceJoin(names, "id", "nm", k = 2, q = 2)
      .orderBy("i", "j")
  }

  /** Entity resolution (composition): near-identical part names clustered
    * into canonical entities — the fuzzy-join pair generation (q89's
    * Ed-Join prefix filter, no cross product), the components closure
    * (dedup_corpus's engine), and a lexicographic-min canonical pick,
    * composed end-to-end. Certifies that the dedup stack generalizes
    * from document identity to entity identity; every (name → canon)
    * assignment is pinned by the oracle's recursive-CTE replay.
    */
  private def q103(s: SparkSession, d: String): DataFrame = {
    val names = t(s, d, "part").groupBy(col("p_name").as("nm"))
      .agg(min("p_partkey").as("id"))
    val pairs = operators.FuzzyJoin
      .editDistanceJoin(names, "id", "nm", k = 2, q = 2)
      .select("i", "j")
    val labels = operators.Dedup.components(pairs)
    val lab = names.join(labels, names("id") === labels("doc_id"), "left")
      .select(col("nm"), coalesce(col("comp"), col("id")).as("comp"))
    val canon = lab.groupBy("comp").agg(min("nm").as("canon"))
    lab.join(canon, Seq("comp")).select("nm", "canon").orderBy("nm")
  }

  /** Quantile normalization of event values across event types: each
    * row's value maps to the global order statistic at its within-type
    * rank fraction. The per-(type, mapped-value) histogram pins the
    * whole mapping; values are selected elements, so engine-exact.
    */
  private def q90(s: SparkSession, d: String): DataFrame =
    Sampling.quantileNormalize(
        t(s, d, "events").select("event_type", "value")
          .filter(col("value").isNotNull),
        Seq("event_type"), "value")
      .groupBy(col("event_type"), round(col("qnorm"), 6).as("qn"))
      .agg(count(lit(1)).as("c"))
      .orderBy("event_type", "qn")


  /** Filter-funnel attrition report: every document tagged with the
    * FIRST quality rule it fails (order: nonempty → lang_en → len_band →
    * min_tokens), bucket counts + id sums. Buckets are additive — they
    * sum to the corpus — which per-rule independent counts can't give.
    */
  private def q91(s: SparkSession, d: String): DataFrame =
    TextAnalysis.filterFunnel(t(s, d, "documents"), Seq(
        "nonempty" -> (length(col("text")) > 0),
        "lang_en" -> (col("lang") === "en"),
        "len_band" -> col("n_chars").between(150, 1500),
        "min_tokens" -> (size(graft.functions.TextFunctions.tokens(col("text"))) >= 30)))
      .groupBy(coalesce(col("fail_rule"), lit("survived")).as("bucket"))
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
      .orderBy("bucket")

  /** Quantized ±1 random projection (JL) of the embeddings to 8 integer
    * components, in tall (vec_id, j, p) form — integer arithmetic and
    * md5-derived signs, so the oracle replays it exactly.
    */
  private def q92(s: SparkSession, d: String): DataFrame =
    Similarity.randomProject(t(s, d, "embeddings"), "vec_id", "embedding",
        inDim = 64, outDim = 8)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "p")))
      .orderBy("vec_id", "j")

  /** PSI drift between the first and second half of the events month:
    * 20 fixed bins over value ∈ [0, 500) plus under/overflow, per-bin
    * counts and (rounded) PSI contributions. The oracle replays the
    * smoothing arithmetic exactly.
    */
  private def q93(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val cut = lit("2024-01-15").cast("timestamp")
    Ingest.psi(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value", lo = 0.0, hi = 500.0, bins = 20)
      .select(col("bin"), col("n_before"), col("n_after"),
        round(col("contrib"), 9).as("contrib"))
      .orderBy("bin")
  }

  /** Rendezvous-hash shard assignment of documents to 5 shards: per-shard
    * counts and id sums pin every key's argmax. The oracle replays the
    * highest-random-weight pick via a window over the exploded shard list.
    */
  private def q94(s: SparkSession, d: String): DataFrame =
    Indexing.rendezvousShard(t(s, d, "documents"), "doc_id", nShards = 5)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
      .orderBy("shard")

  /** Key-skew report: the 10 heaviest users by event count with exact
    * ppm shares — the pre-salting diagnosis run.
    */
  private def q95(s: SparkSession, d: String): DataFrame =
    Ingest.skewReport(t(s, d, "events"), "user_id", topK = 10)


  /** Group-aware 5-fold CV assignment keyed on `source` (all docs of a
    * source share a fold — leakage-safe): per-fold doc counts, id sums,
    * and distinct-source counts.
    */
  private def q96(s: SparkSession, d: String): DataFrame =
    Sampling.kfold(t(s, d, "documents"), "source", k = 5)
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"),
        countDistinct("source").as("n_src"))
      .orderBy("fold")



  /** Purged time-series 5-fold split of the event stream with a 30-min
    * embargo: contiguous equal-count time folds via the global-rank
    * integer cut, plus the embargo flag naming the fold each row leaks
    * into — q96's temporal sibling ([[Sampling.purgedTimeFolds]]), where
    * hash folds would mix future into past.
    */
  private def qPurgedFolds(s: SparkSession, d: String): DataFrame =
    Sampling.purgedTimeFolds(
        t(s, d, "events").select(col("event_id"), col("ts")),
        "ts", Seq("event_id"), k = 5, embargoSeconds = 1800)
      .select(col("event_id"), col("fold"), col("emb"))
      .orderBy("event_id")

  /** Correlated EXISTS + NOT EXISTS in one query — the two remaining
    * subquery decorrelation paths (semi- and anti-join rewrites) after
    * q31's scalar and q49's lateral forms.
    */
  private def q97(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL) — duplicate-
    * preserving semantics, a different operator family than q07/q19's
    * set-distinct forms.
    */
  private def q98(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """WITH ia AS (
        |  SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'A'
        |  INTERSECT ALL
        |  SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
        |), ea AS (
        |  SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'A'
        |  EXCEPT ALL
        |  SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
        |)
        |SELECT 'intersect_all' AS op, COUNT(*) AS n,
        |  CAST(SUM(q) AS BIGINT) AS qsum FROM ia
        |UNION ALL
        |SELECT 'except_all' AS op, COUNT(*) AS n,
        |  CAST(SUM(q) AS BIGINT) AS qsum FROM ea
        |ORDER BY op""".stripMargin)
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE): bounded-depth reachability
    * with path counts over the order graph — the same recursion the
    * DuckDB oracles use, now running native in Spark too.
    */
  private def q99(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """WITH RECURSIVE reach(v, d) AS (
        |  SELECT CAST(0 AS BIGINT) AS v, 0 AS d
        |  UNION ALL
        |  SELECT e.dst, r.d + 1
        |  FROM reach r
        |  JOIN (SELECT DISTINCT o_custkey % 50 AS src,
        |               o_orderkey % 50 AS dst FROM orders) e
        |    ON e.src = r.v
        |  WHERE r.d < 3
        |)
        |SELECT v, MIN(d) AS d, COUNT(*) AS paths
        |FROM reach GROUP BY v ORDER BY v""".stripMargin)
  }


  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): a derived
    * bucket key that is NULL for sub-unit values joins a 4-row dimension
    * that includes a NULL-keyed label — the comparator plain `=` can't
    * express (NULL = NULL is NULL; NULL <=> NULL is TRUE).
    */
  private def q100(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(
      when(col("value") < 1.0, lit(null).cast("long"))
        .otherwise(floor(col("value") / 100.0).cast("long")).as("k"),
      col("event_id"))
    val dim = s.createDataFrame(Seq(
        (Option.empty[Long], "missing"), (Some(0L), "low"),
        (Some(2L), "mid"), (Some(4L), "high")))
      .toDF("k", "label")
    ev.join(dim, ev("k") <=> dim("k"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
      .orderBy("label")
  }

  /** Spark 4 VARIANT path: props parsed with parse_json into a VARIANT
    * column, fields extracted with variant_get — the semi-structured
    * storage type (vs q10's string-path get_json_object).
    */
  private def q101(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT)
        |    AS ksum,
        |  MIN(variant_get(parse_json(props), '$.k', 'int')) AS kmin,
        |  MAX(variant_get(parse_json(props), '$.k', 'int')) AS kmax
        |FROM events WHERE props IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN`): a
    * scalar UDF and a TABLE function declared in SQL, resolved and
    * INLINED by Catalyst (no opaque closure — pushdown and codegen see
    * through them, unlike a Scala udf()). The oracle states the inlined
    * expressions directly, so the hash only matches if the function
    * bodies round-trip through the SQL front door unchanged.
    */
  private def q102(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_rev(p DOUBLE, disc DOUBLE)
        |RETURNS DOUBLE RETURN p * (1.0 - disc)""".stripMargin)
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_flag_rev(flag STRING)
        |RETURNS TABLE (l_linestatus STRING, rev DOUBLE) RETURN
        |  SELECT l_linestatus,
        |    ROUND(SUM(graft_rev(l_extendedprice, l_discount)), 2)
        |  FROM lineitem WHERE l_returnflag = flag GROUP BY 1""".stripMargin)
    s.sql(
      """SELECT 'A' AS flag, * FROM graft_flag_rev('A')
        |UNION ALL SELECT 'R', * FROM graft_flag_rev('R')
        |ORDER BY flag, l_linestatus""".stripMargin)
  }

  // ------------------------------------------------------------ registry --

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sum_count" -> (q01 _),
    "q02_group_agg" -> (q02 _),
    "q03_join_agg" -> (q03 _),
    "q04_anti_join" -> (q04 _),
    "q05_window_rank" -> (q05 _),
    "q06_topk" -> (q06 _),
    "q07_intersect" -> (q07 _),
    "q08_ts_filter" -> (q08 _),
    "q09_hour_bucket" -> (q09 _),
    "q10_json_get" -> (q10 _),
    "q11_distinct_agg" -> (q11 _),
    "q12_dup_groups" -> (q12 _),
    "q13_cosine_top1" -> (q13 _),
    "q14_token_topk" -> (q14 _),
    "q15_crawl" -> (q15 _),
    "q16_monoid" -> (q16 _),
    "q17_rollup" -> (q17 _),
    "q18_cube" -> (q18 _),
    "q19_except" -> (q19 _),
    "q20_scalar_funcs" -> (q20 _),
    "q21_sliding_window" -> (q21 _),
    "q22_session_window" -> (q22 _),
    "q23_asof_join" -> (q23 _),
    "q24_range_join" -> (q24 _),
    "q25_semi_join" -> (q25 _),
    "q26_running_sum" -> (q26 _),
    "q27_lag_diff" -> (q27 _),
    "q28_pivot" -> (q28 _),
    "q29_percentile" -> (q29 _),
    "q30_stats" -> (q30 _),
    "q31_scalar_subquery" -> (q31 _),
    "q32_string_agg" -> (q32 _),
    "q33_sql_text" -> (q33 _),
    "q34_array_funcs" -> (q34 _),
    "q35_union_all" -> (q35 _),
    "q36_datediff" -> (q36 _),
    "q37_map_funcs" -> (q37 _),
    "q38_month_agg" -> (q38 _),
    "q39_string_funcs" -> (q39 _),
    "q40_topk_agg" -> (q40 _),
    "q41_minmax_by" -> (q41 _),
    "q42_cond_agg" -> (q42 _),
    "q43_regex_null" -> (q43 _),
    "q44_like_scan" -> (q44 _),
    "q45_asof_bucketed" -> (q45 _),
    "q46_hash_split" -> (q46 _),
    "q47_corpus_prep" -> (q47 _),
    "q48_window_dist" -> (q48 _),
    "q49_lateral" -> (q49 _),
    "q50_unpivot" -> (q50 _),
    "q51_grouping_sets" -> (q51 _),
    "q52_group_split" -> (q52 _),
    "q53_domain_cap" -> (q53 _),
    "q54_resample" -> (q54 _),
    "q55_full_outer" -> (q55 _),
    "q56_range_frame" -> (q56 _),
    "q57_stratified" -> (q57 _),
    "q58_centroids" -> (q58 _),
    "q59_mode" -> (q59 _),
    "q60_histogram" -> (q60 _),
    "q61_quantize" -> (q61 _),
    "q62_pack" -> (q62 _),
    "q63_binpack" -> (q63 _),
    "q64_upsert" -> (q64 _),
    "q65_pagerank" -> (q65 _),
    "q66_triangles" -> (q66 _),
    "q67_scd2" -> (q67 _),
    "q_scd2_pit" -> (qScd2Pit _),
    "q68_vocab_encode" -> (q68 _),
    "q69_winsorize" -> (q69 _),
    "q70_global_ids" -> (q70 _),
    "q71_digest" -> (q71 _),
    "q72_profile" -> (q72 _),
    "q73_diff" -> (q73 _),
    "q74_importance" -> (q74 _),
    "q75_standardize" -> (q75 _),
    "q76_weighted" -> (q76 _),
    "q77_ewma" -> (q77 _),
    "q78_cdc" -> (q78 _),
    "q79_sessionize" -> (q79 _),
    "q80_url" -> (q80 _),
    "q81_star" -> (q81 _),
    "q82_streaks" -> (q82 _),
    "dedup_quality" -> (EntryDedup.dedupQuality _),
    "q83_funnel" -> (q83 _),
    "q84_negatives" -> (q84 _),
    "text_cooc" -> (EntryText.textCooc _),
    "text_linededup" -> (EntryText.textLineDedup _),
    "stream_tws" -> (EntryStream.streamTws _),
    "text_chunks" -> (EntryText.textChunks _),
    "text_boilerplate" -> (EntryText.textBoilerplate _),
    "q85_temperature" -> (q85 _),
    "q86_budget" -> (q86 _),
    "q87_outliers" -> (q87 _),
    "q88_overlap" -> (q88 _),
    "q89_fuzzy" -> (q89 _),
    "q90_qnorm" -> (q90 _),
    "text_rrf" -> (EntryText.textRrf _),
    "hybrid_index_search" -> (EntryText.hybridIndexSearch _),
    "q91_attrition" -> (q91 _),
    "q92_project" -> (q92 _),
    "q93_psi" -> (q93 _),
    "q94_shards" -> (q94 _),
    "q95_skew" -> (q95 _),
    "stream_static" -> (EntryStream.streamStatic _),
    "q96_folds" -> (q96 _),
    "q_purged_folds" -> (qPurgedFolds _),
    "text_normalize" -> (EntryText.textNormalize _),
    "text_bpe" -> (EntryText.textBpe _),
    "text_unigram" -> (EntryText.textUnigram _),
    "q97_exists" -> (q97 _),
    "stream_timer" -> (EntryStream.streamTimer _),
    "q98_setops_all" -> (q98 _),
    "q99_recursive" -> (q99 _),
    "q100_nullsafe" -> (q100 _),
    "q101_variant" -> (q101 _),
    "q102_sql_udf" -> (q102 _),
    "q103_entity" -> (q103 _),
    "q104_asof_forward" -> (q104 _),
    "q105_asof_nearest" -> (q105 _),
    "text_pmi" -> (EntryText.textPmi _),
    "text_diversity" -> (EntryText.textDiversity _),
    "text_decontaminate" -> (EntryText.textDecontaminate _),
    "text_despan" -> (EntryText.textDespan _),
    "text_selfdedup" -> (EntryText.textSelfDedup _),
    "q_approx_quantile" -> (qApproxQuantile _),
    "stream_dedup" -> (EntryStream.streamDedup _),
    "stream_dedup_wm" -> (EntryStream.streamDedupWm _),
    "stream_mg_topk" -> (EntryStream.streamMgTopk _),
    "stream_index_dedup" -> (EntryStream.streamIndexDedup _),
    "stream_ann" -> (EntryStream.streamAnn _),
    "stream_bm25" -> (EntryStream.streamBm25 _),
    "stream_hll" -> (EntryStream.streamHll _),
    "stream_series" -> (EntryStream.streamSeries _),
    "stream_components" -> (EntryDedup.streamComponents _),
    "stream_sliding" -> (EntryStream.streamSliding _),
    "stream_session" -> (EntryStream.streamSession _),
    "stream_state" -> (EntryStream.streamState _),
    "stream_join" -> (EntryStream.streamJoin _),
    "stream_left_join" -> (EntryStream.streamLeftJoin _),
    "dedup_exact" -> (EntryDedup.dedupExact _),
    "dedup_minhash" -> (EntryDedup.dedupMinhash _),
    "dedup_incremental" -> (EntryDedup.dedupIncremental _),
    "dedup_index" -> (EntryDedup.dedupIndex _),
    "dedup_simhash" -> (EntryDedup.dedupSimhash _),
    "dedup_ngram" -> (EntryDedup.dedupNgram _),
    "dedup_cross" -> (EntryDedup.dedupCross _),
    "dedup_screen_index" -> (EntryDedup.dedupScreenIndex _),
    "dedup_screen_rebuild" -> (EntryDedup.dedupScreenRebuild _),
    "stream_screen" -> (EntryStream.streamScreen _),
    "dedup_embedding" -> (EntryDedup.dedupEmbedding _),
    "dedup_semantic" -> (EntryDedup.dedupSemantic _),
    "dedup_semantic_clustered" -> (EntryDedup.dedupSemanticClustered _),
    "dedup_embedding_index" -> (EntryDedup.dedupEmbeddingIndex _),
    "dedup_embedding_rebuild" -> (EntryDedup.dedupEmbeddingRebuild _),
    "dedup_components_index" -> (EntryDedup.dedupComponentsIndex _),
    "dedup_components_rebuild" -> (EntryDedup.dedupComponentsRebuild _),
    "dedup_corpus" -> (EntryDedup.dedupCorpus _),
    "ann_topk" -> (EntryDedup.annTopk _),
    "ann_lsh" -> (EntryDedup.annLsh _),
    "ann_ivf" -> (EntryDedup.annIvf _),
    "ann_ivf_index" -> (EntryDedup.annIvfIndex _),
    "ann_ivf_retrain" -> (EntryDedup.annIvfRetrain _),
    "ann_pq" -> (EntryDedup.annPq _),
    "ann_pq_index" -> (EntryDedup.annPqIndex _),
    "ann_ivfpq" -> (EntryDedup.annIvfPq _),
    "text_langid" -> (EntryText.textLangid _),
    "text_quality" -> (EntryText.textQuality _),
    "text_tokens" -> (EntryText.textTokens _),
    "text_fingerprint" -> (EntryText.textFingerprint _),
    "text_tfidf" -> (EntryText.textTfidf _),
    "text_repetition" -> (EntryText.textRepetition _),
    "text_quality_model" -> (EntryText.textQualityModel _),
    "text_dsir" -> (EntryText.textDsir _),
    "text_bm25_index" -> (EntryText.textBm25Index _),
    "text_phrase" -> (EntryText.textPhrase _),
    "text_near" -> (EntryText.textNear _),
    "text_snippet" -> (EntryText.textSnippet _),
    "text_lm_score" -> (EntryText.textLmScore _),
    "text_redact" -> (EntryText.textRedact _),
    "text_spans" -> (EntryText.textSpans _),
    "text_bm25" -> (EntryText.textBm25 _),
    "text_winnow" -> (EntryText.textWinnow _),
    "mm_features" -> (EntryDedup.mmFeatures _),
    "stream_tumbling" -> (EntryStream.streamTumbling _),
    "q_hll" -> (qHll _),
    "q_hll_merge" -> (qHllMerge _),
    "q_incr_agg" -> (qIncrAgg _),
    "q_zonemap_scan" -> (qZonemapScan _),
    "q_zonemap_maintain" -> (qZonemapMaintain _),
    "layout_zorder" -> (qLayoutZorder _),
    "q_zorder_key" -> (qZorderKey _),
    "sketch_moments" -> (qMoments _),
    "q_compact" -> (qCompact _),
    "stream_zonemap" -> (EntryStream.streamZonemap _),
    "q_bloommap" -> (qBloommap _),
    "q_pipeline" -> (qPipeline _),
    "q_mg_topk" -> (qMgTopk _),
    "stream_incr_agg" -> (EntryStream.streamIncrAgg _),
    "q_series_topk" -> (qSeriesTopk _))


  /** DuckDB oracle SQL, one per SQL-expressible query — the full map
    * lives in [[Oracles]] (split out so this registry file stays
    * reviewable; entries are unchanged byte-for-byte).
    */
  def oracleSql: Map[String, String] = Oracles.sql
}
