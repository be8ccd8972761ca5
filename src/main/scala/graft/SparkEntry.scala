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

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(t(s, d, "documents"), "doc_id", Seq("text"))
      .select(col("doc_id"), col("group_size").as("n"))
      .orderBy("doc_id")

  private def dedupMinhash(s: SparkSession, d: String): DataFrame =
    // 64 hashes / 16 bands of 4: P(miss | J=0.9) = (1-0.9^4)^16 ≈ 4e-8 —
    // verified output still equals brute force w.h.p. at half the hash cost
    Dedup.minHashPairs(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .orderBy("i", "j")

  /** Incremental ingest dedup: docs ≥ 400 arrive as the new batch and are
    * checked against the 0-399 corpus index — pairs touching ≥1 new doc.
    * Oracle: brute-force pairs restricted to j ≥ 400 (ids are ordered, so
    * j ≥ 400 ⟺ at least one member is new).
    */
  private def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Dedup.incrementalMinHashPairs(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .orderBy("i", "j")
  }

  /** The persistent-index form of [[dedupIncremental]] — same split, same
    * LSH geometry, same oracle: the corpus's band buckets and shingle
    * sets are materialized ONCE as bucketed parquet tables, then the
    * batch probes the stored index without re-hashing corpus text (the
    * shape whose per-batch cost stays flat as the corpus grows).
    */
  private def dedupIndex(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_mh_index").toString
    val idx = DedupIndex.build(docs.filter(col("doc_id") < 400),
      "doc_id", "text", path, "graft_q_mhidx",
      shingleN = 3, numHashes = 64, bands = 16, buckets = 8)
    idx.probe(docs.filter(col("doc_id") >= 400), "doc_id", "text", threshold = 0.8)
      .orderBy("i", "j")
  }

  /** Continuous-ingest dedup THROUGH the persistent index: the documents
    * arrive as a file-source stream in three micro-batches; each batch is
    * probed against everything indexed before it (plus itself via the
    * probe's self-join) and then folded into the index for the batches
    * after it. Cumulative pairs are batch-boundary INVARIANT — each pair
    * is emitted exactly once, by whichever batch completes it — so the
    * oracle is the FULL corpus pair closure, the same SQL as
    * `dedup_minhash`, with no reference to how the stream was chopped.
    */
  private def streamIndexDedup(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft_sid").toString
    val n = docs.agg(max("doc_id")).head.getLong(0) + 1
    // three arrival waves, one file each, so maxFilesPerTrigger=1 yields
    // three micro-batches (wave ORDER is irrelevant — see invariance above)
    Seq((0L, n / 3), (n / 3, 2 * n / 3), (2 * n / 3, n + 1)).foreach {
      case (lo, hi) =>
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    val idx = DedupIndex.build(docs.filter(lit(false)), "doc_id", "text",
      s"$base/idx", "graft_q_sid",
      shingleN = 3, numHashes = 64, bands = 16, buckets = 8)
    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in")
    idx.probeStream(stream, "doc_id", "text",
      s"$base/pairs", s"$base/ckpt", threshold = 0.8)
    s.read.parquet(s"$base/pairs").orderBy("i", "j")
  }

  private def dedupSimhash(s: SparkSession, d: String): DataFrame =
    // 8-bit blocks (256 values/block) + Hamming <= 16: measured exact vs
    // brute force at sf0.01 AND sf0.1 (true-pair Hamming tail reaches 14)
    // at ~1/6 the candidate-join volume of the former 16x4-bit config
    Dedup.simHashPairs(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, blocks = 8, maxHamming = 16, threshold = 0.8)
      .orderBy("i", "j")

  private def dedupNgram(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.8)
      .orderBy("i", "j")

  private def dedupCorpus(s: SparkSession, d: String): DataFrame =
    Dedup.dedupeCorpus(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Quality-aware corpus dedup: survivors keep the LONGEST member of
    * each near-dup component (n_chars as the quality score, ties to the
    * smaller id) — the keep-the-best-copy policy, against the same
    * recursive-closure oracle as dedup_corpus with an argmax survivor
    * rule.
    */
  private def dedupQuality(s: SparkSession, d: String): DataFrame =
    Dedup.dedupeCorpusBy(t(s, d, "documents"), "doc_id", "text", "n_chars")
      .orderBy("doc_id")

  private def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.95)
      .select(col("i"), col("j"), col("cos").as("sim"))
      .orderBy("i", "j")

  // ---------------------------------------------------------- similarity --

  private def annTopk(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")

  private def annLsh(s: SparkSession, d: String): DataFrame =
    Similarity.srpTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        Seq(0L, 1L, 2L, 3L, 4L), 3, dim = 64)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")

  /** IVF with nprobe = nClusters is exhaustive ⇒ exact — shares the
    * brute-force oracle while exercising the index path end-to-end.
    */
  private def annIvf(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val idx = Similarity.IvfIndex.build(s, emb, "vec_id", "embedding", nClusters = 16)
    // DataFrame query side: no driver materialization of the query vectors
    idx.search(emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")
  }

  /** The persisted form of [[annIvf]]: the index is saved as centroids
    * parquet + cluster-bucketed assignments, re-opened cold, and searched
    * through the bucket-pruned literal-IN path (nprobe = all clusters, so
    * the result equals exact search and shares `ann_topk`'s oracle).
    */
  private def annIvfIndex(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val idx = Similarity.IvfIndex.build(s, emb, "vec_id", "embedding", nClusters = 16)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString
    Similarity.IvfIndex.save(idx, "graft_q_ivfidx", path)
    val reopened = Similarity.IvfIndex.open(s, "graft_q_ivfidx", path)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    reopened.search(queries, k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")
  }

  /** Product-quantized ADC search: codebooks trained on the corpus (seeded,
    * deterministic), every vector compressed to 8 one-byte codes, queries
    * ranked by asymmetric distance. Rows-only BY MEASURED NECESSITY, not
    * convenience: an IVF-style tolerance oracle (ADC rank == exact L2
    * rank at a fine-enough codebook) was probed and does not exist on
    * this fixture — its embeddings are near-uniform on the sphere (every
    * inter-rank exact-distance gap is 0.5–2 % of the distance itself),
    * and even a near-degenerate dsub=2 / k=256 codebook (32× finer than
    * the production shape) still reorders ranks on 4 of 10 query legs
    * across sf0.01/sf0.1. PqSpec certifies the real contract instead:
    * determinism, feasibility, and recall on separated clusters.
    */
  private def annPq(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16)
    Pq.adcTopK(emb, "vec_id", "embedding", cb, Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"), col("adist"))
      .orderBy("query_id", "rnk")
  }

  // ----------------------------------------------------------------- text --

  private def textLangid(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  private def textQuality(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id") +: TextAnalysis.qualityColumns(col("text")): _*)
      .orderBy("doc_id")

  private def textTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id") +: TextAnalysis.tokenCountColumns(col("text")): _*)
      .orderBy("doc_id")

  private def textFingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Winnowing sketch — hash-function-specific, so rows-only check. The
    * sketch is reduced to scalar columns (size + digest): the driver's
    * rows-only check sorts result values, which a raw array column breaks;
    * exploding instead would re-evaluate the kernel per output row
    * (projections collapse into generators). xxhash64 over an array is
    * order-SENSITIVE, so the digest is taken over array_sort(sketch) —
    * stable regardless of the kernel's emission order (Winnow happens to
    * emit sorted distinct minima today, but the digest must not depend on
    * that coupling).
    */
  private def textWinnow(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.winnow(col("text")).as("sketch"))
      .select(col("doc_id"), size(col("sketch")).as("n"),
        xxhash64(array_sort(col("sketch"))).as("digest"))
      .orderBy("doc_id")

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

  /** Benchmark decontamination over the documents table: docs sharing an
    * 8-token shingle with the pseudo-holdout (doc_id % 10 = 5), with the
    * count of distinct contaminating shingles.
    */
  private def textDecontaminate(s: SparkSession, d: String): DataFrame =
    TextAnalysis.contamination(t(s, d, "documents"), "doc_id", "text",
        col("doc_id") % 10 === 5, n = 8)
      .orderBy("doc_id")

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

  /** Windowed co-occurrence counts (forward window 3, min count 50):
    * top-30 ordered token pairs — the GloVe-matrix shape. Counts are
    * integers and ties break on (x, y), so the limit cut is exact.
    */
  private def textCooc(s: SparkSession, d: String): DataFrame =
    TextAnalysis.cooccurrence(t(s, d, "documents"), "text", window = 3, minCount = 50)
      .orderBy(col("c").desc, col("x"), col("y"))
      .limit(30)

  /** Sliding-window chunking (len 8, stride 6) of every document,
    * digested per chunk so the compare pins exact chunk boundaries and
    * content without shipping token arrays.
    */
  private def textChunks(s: SparkSession, d: String): DataFrame =
    Packing.slidingChunks(t(s, d, "documents"), "doc_id", "text", chunkLen = 8, stride = 6)
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("digest"))
      .orderBy("doc_id", "chunk_id")

  /** Line-level (C4/Dolma paragraph) dedup over a lined view of the
    * corpus: each document re-laid-out as newline-separated 10-token
    * lines (the fixture corpus has no natural line breaks), then every
    * repeated line keeps only its globally first (doc, position)
    * occurrence. Per-doc kept/removed counts plus the md5 of the
    * reassembled text pin the exact surviving line set and order.
    */
  private def textLineDedup(s: SparkSession, d: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val n = greatest(ceil(size(toks).cast("double") / 10.0), lit(1L))
    val lined = t(s, d, "documents").select(col("doc_id"),
      array_join(transform(sequence(lit(1L), n),
        i => array_join(slice(toks, ((i - lit(1L)) * 10 + 1).cast("int"),
          lit(10)), " ")), "\n").as("text"))
    Dedup.lineDedup(lined, "doc_id", "text")
      .select(col("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("digest"))
      .orderBy("doc_id")
  }

  /** PMI bigram collocations over the documents corpus: top-20 adjacent
    * pairs most over-represented vs their unigram frequencies (min count
    * 5). Ordering uses the ROUNDED pmi so a last-ulp ln() difference
    * between engines cannot flip the limit cut.
    */
  private def textPmi(s: SparkSession, d: String): DataFrame =
    TextAnalysis.pmiBigrams(t(s, d, "documents"), "text", minCount = 5)
      .select(col("x"), col("y"), col("cxy"), round(col("pmi"), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("x"), col("y"))
      .limit(20)

  /** Per-document lexical diversity: token/type counts, type-token ratio,
    * token-distribution Shannon entropy (nats) — the template-page /
    * keyword-stuffing quality gate.
    */
  private def textDiversity(s: SparkSession, d: String): DataFrame =
    TextAnalysis.lexicalDiversity(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("ttr"), 6).as("ttr"), round(col("entropy"), 6).as("entropy"))
      .orderBy("doc_id")

  /** Span-level decontamination over the documents table: for every doc
    * sharing an 8-gram with the pseudo-holdout, the covered tokens are
    * excised and the remainder digested (md5 keeps the compare exact
    * without dumping full texts).
    */
  private def textDespan(s: SparkSession, d: String): DataFrame =
    TextAnalysis.removeContaminatedSpans(t(s, d, "documents"), "doc_id", "text",
        col("doc_id") % 10 === 5, n = 8)
      .select(col("doc_id"), col("n_removed"), md5(col("clean_text")).as("clean_digest"))
      .orderBy("doc_id")

  /** Corpus self-dedup of cross-document repeated 8-grams (keep-first):
    * the Lee et al. ExactSubstr shape with no holdout — every span
    * appearing in >1 document survives only in its min-doc_id owner.
    */
  private def textSelfDedup(s: SparkSession, d: String): DataFrame =
    TextAnalysis.removeRepeatedSpans(t(s, d, "documents"), "doc_id", "text", k = 8)
      .select(col("doc_id"), col("n_removed"), md5(col("clean_text")).as("clean_digest"))
      .orderBy("doc_id")

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

  /** Repetition metrics per document (the MassiveText/Gopher-style filter
    * signals): duplicate 3-gram fraction (narrow, per-row arrays) and
    * top-token concentration (two hash-aggs). Ratios round to 6 digits —
    * small-integer ratios k/n can terminate with a '5' exactly at digit 4,
    * where Spark's decimal-string rounding and the oracle's binary
    * rounding disagree; at digit 7 that needs a 5^7 denominator, which
    * token counts cannot reach.
    */
  private def textRepetition(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    // Materialize token and shingle arrays ONCE through a cache: both are
    // lambda-bearing expressions (excluded from subexpression elimination),
    // so referencing them from collapsed projections or generators would
    // re-evaluate the whole array per reference / per output row.
    val arr = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"),
        graft.functions.TextFunctions.shingles(col("text"), 3).as("g"))
      .cache()
    val top = arr.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("maxc"), sum(col("c")).as("n"))
      .select(col("doc_id"),
        round(col("maxc").cast("double") / col("n"), 6).as("top_token_frac"))
    val dup = arr.select(col("doc_id"),
      round(when(size(col("g")) === 0, 0.0)
        .otherwise(lit(1.0) -
          size(array_distinct(col("g"))).cast("double") / size(col("g"))), 6)
        .as("dup_3gram_frac"))
    dup.join(top, Seq("doc_id")).orderBy("doc_id")
  }

  /** BM25 top-15 docs for a fixed 3-term query; ordering uses the ROUNDED
    * score so near-equal sums (whose last bits depend on summation order)
    * tie-break on doc_id identically in both engines.
    */
  private def textBm25(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bm25(t(s, d, "documents"), "doc_id", "text",
        Seq("table", "scan", "join"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(15)
      .select(col("doc_id"), col("score"))

  /** Top repeated 10-token spans across documents — the exact-substring
    * duplication signal; only duplicate documents share spans this long
    * in the fixture corpus.
    */
  private def textSpans(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repeatedSpans(t(s, d, "documents"), "doc_id", "text", 10)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("ngram"))
      .limit(20)

  /** PII redaction digest per document. The fixture corpus carries no PII,
    * so the redaction is the identity here — the oracle still re-runs the
    * same RE2-compatible patterns, and TextAnalysisSpec plants real
    * emails/IPs/phones to pin the rewrite behavior.
    */
  private def textRedact(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        md5(TextAnalysis.redactPii(col("text"))).as("digest"))
      .orderBy("doc_id")

  /** Corpus-trained bigram LM score per document (model-based quality
    * filtering). Output order and rounding as elsewhere.
    */
  private def textLmScore(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bigramLmScore(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")

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

  /** TF-IDF top terms per document — tf/df over the WHOLE corpus, output
    * truncated to the first 30 docs' top-3 terms (rank ties broken by
    * term, deterministic).
    */
  private def textTfidf(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    TextAnalysis.tfIdf(t(s, d, "documents"), "doc_id", "text")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3 && col("doc_id") < 30)
      .select(col("doc_id"), col("rnk"), col("term"),
        round(col("tfidf"), 4).as("score"))
      .orderBy("doc_id", "rnk")
  }

  // ----------------------------------------------------------- multimodal --

  private def mmFeatures(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "text/plain"))
    feats.toDF()
      .select(col("id").as("doc_id"), col("n_bytes"))
      .join(docs.select(col("doc_id"),
        md5(col("text").cast("binary")).as("digest")), Seq("doc_id"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ streaming --

  /** Tumbling-window streaming aggregation run to completion over the
    * bounded events fixture (complete output mode ⇒ equals the batch
    * answer; the oracle is the batch SQL).
    */
  private def streamTumbling(s: SparkSession, d: String): DataFrame = {
    val stream = EventStreams.readEvents(s, d)
    val agg = EventStreams.tumblingCounts(stream, "1 hour", "2 hours")
    EventStreams.runToMemory(s, agg, s"stream_tumbling_${System.nanoTime()}", "complete")
      .select(unix_timestamp(col("window.start")).as("h"), col("event_type"),
        col("n"), round(col("v"), 2).as("v"))
      .orderBy("h", "event_type")
  }

  private def streamSliding(s: SparkSession, d: String): DataFrame = {
    val agg = EventStreams.slidingCounts(EventStreams.readEvents(s, d),
      "10 minutes", "5 minutes")
    EventStreams.runToMemory(s, agg, s"stream_sliding_${System.nanoTime()}", "complete")
      .groupBy(unix_timestamp(col("window.start")).as("ws"))
      .agg(sum("n").as("c"))
      .orderBy("ws")
  }

  private def streamSession(s: SparkSession, d: String): DataFrame = {
    val agg = EventStreams.sessionCounts(EventStreams.readEvents(s, d), "30 minutes")
    EventStreams.runToMemory(s, agg, s"stream_session_${System.nanoTime()}", "complete")
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("ss"), col("n"))
      .orderBy("user_id", "ss")
  }

  /** Stateful streaming: per-user running totals via flatMapGroupsWithState
    * in update mode; the final state per user equals the batch aggregation.
    */
  private def streamState(s: SparkSession, d: String): DataFrame = {
    val updates = EventStreams.userRunningTotals(s, EventStreams.readEvents(s, d))
    val mem = EventStreams.runToMemory(s, updates.toDF(),
      s"stream_state_${System.nanoTime()}", "update")
    val w = Window.partitionBy("userId").orderBy(col("nEvents").desc)
    mem.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("userId").as("user_id"), col("nEvents").as("n"),
        round(col("totalValue"), 2).as("v"))
      .orderBy("user_id")
  }

  /** Spark-4 arbitrary state: per-(user, type) running counts via
    * transformWithState (typed MapState on the RocksDB state store).
    * Update mode emits a new total whenever a (user, type) cell changes;
    * counts are monotone, so max-per-cell over the drained stream is the
    * final state — which must equal the batch GROUP BY count.
    */
  private def streamTws(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val updates = EventStreams.userTypeCounts(s, EventStreams.readEvents(s, d)).toDF()
      EventStreams.runToMemory(s, updates, s"stream_tws_${System.nanoTime()}", "update")
        .groupBy(col("userId").as("user_id"), col("eventType").as("event_type"))
        .agg(max(col("n")).as("n"))
        .orderBy("user_id", "event_type")
    } finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }

  /** Watermarked stream-stream interval join run to completion. */
  private def streamJoin(s: SparkSession, d: String): DataFrame = {
    val joined = EventStreams.purchaseAfterClick(EventStreams.readEvents(s, d))
    EventStreams.runToMemory(s, joined, s"stream_join_${System.nanoTime()}", "append")
      .orderBy("purchase_id", "click_id")
  }

  /** Streaming dedup: drop duplicate (user_id, event_type) pairs, then a
    * complete-mode count per type — whichever physical row survives the
    * dedup, the count equals the batch COUNT(DISTINCT user_id).
    */
  private def streamDedup(s: SparkSession, d: String): DataFrame = {
    val deduped = EventStreams.dedupEvents(EventStreams.readEvents(s, d),
      keys = Seq("user_id", "event_type"))
    val agg = deduped.groupBy("event_type").agg(count(lit(1)).as("n"))
    EventStreams.runToMemory(s, agg, s"stream_dedup_${System.nanoTime()}", "complete")
      .orderBy("event_type")
  }

  /** HLL sketch cardinality — implementation-specific, rows-only check in
    * the driver gate; SketchSpec bounds it within ±2% of exact. rsd=0.01
    * (vs the 0.05 default) — a few KB more sketch for percent-level error,
    * the right trade anywhere near 100 TB cardinalities.
    */
  private def qHll(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  /** KLL/GK-style quantile sketch — implementation-specific, rows-only. */
  private def qApproxQuantile(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(expr("percentile_approx(l_extendedprice, 0.5, 1000)"), 2).as("p50"))
      .orderBy("l_returnflag")

  /** C4-rule boilerplate stripping over the same 10-token lined corpus
    * view as `text_linededup`: lines appearing in ≥3 DISTINCT documents
    * are removed from every document (vs lineDedup's keep-first). The
    * per-doc kept/removed counts plus the md5 of the reassembled text
    * pin the exact removal set and order.
    */
  private def textBoilerplate(s: SparkSession, d: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val n = greatest(ceil(size(toks).cast("double") / 10.0), lit(1L))
    val lined = t(s, d, "documents").select(col("doc_id"),
      array_join(transform(sequence(lit(1L), n),
        i => array_join(slice(toks, ((i - lit(1L)) * 10 + 1).cast("int"),
          lit(10)), " ")), "\n").as("text"))
    Dedup.stripBoilerplate(lined, "doc_id", "text", minDocs = 3)
      .select(col("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("digest"))
      .orderBy("doc_id")
  }

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

  /** Reciprocal-rank fusion of two retrievers over the corpus: the BM25
    * list for a fixed keyword query and the dense-cosine list for vector
    * 0, each ranked by its ROUNDED score (engine-stable order), fused
    * with c = 60. Top-20 consensus documents with membership counts.
    */
  private def textRrf(s: SparkSession, d: String): DataFrame = {
    val bmTop = TextAnalysis.bm25(t(s, d, "documents"), "doc_id", "text",
        Seq("table", "scan", "join"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    val wB = Window.orderBy(col("score").desc, col("doc_id"))
    val bmRank = bmTop.withColumn("rank", row_number().over(wB))
      .select("doc_id", "rank")
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val cosTop = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(graft.plans.GraftFunctions.cosine(col("embedding"), col("qv")), 6)
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(50)
    val wC = Window.orderBy(col("cos").desc, col("doc_id"))
    val cosRank = cosTop.withColumn("rank", row_number().over(wC))
      .select("doc_id", "rank")
    Similarity.rrfFuse(Seq(bmRank, cosRank), "doc_id", "rank")
      .select(col("doc_id"), round(col("rrf"), 9).as("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

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

  /** Stream-static broadcast join: the event stream enriched with a
    * batch user-segment dimension, then complete-mode counts per
    * (segment, type) — must equal the batch group-by. No state store,
    * no watermark: the lookup-table streaming pattern.
    */
  private def streamStatic(s: SparkSession, d: String): DataFrame = {
    val dim = t(s, d, "events")
      .filter(col("user_id").isNotNull)
      .select("user_id").distinct()
      .withColumn("segment", (col("user_id") % 3).cast("int"))
    val enriched = graft.streaming.EventStreams.enrichWithStatic(
      graft.streaming.EventStreams.readEvents(s, d), dim, Seq("user_id"))
    val agg = enriched.groupBy("segment", "event_type")
      .agg(count(lit(1)).as("n"))
    graft.streaming.EventStreams.runToMemory(s, agg,
        s"stream_static_${System.nanoTime()}", "complete")
      .orderBy("segment", "event_type")
  }

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

  /** Native NFC normalization over the corpus: per-doc md5 of the
    * canonicalized text (NFC + lower + whitespace collapse + trim) and
    * its length — the canonical form every dedup/fingerprint pass keys
    * on. Runs the codegen'd `graft_normalize` kernel; the oracle replays
    * it with nfc_normalize + regexp in DuckDB.
    */
  private def textNormalize(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        graft.plans.NormalizeText.normalizeText(col("text")).as("norm"))
      .select(col("doc_id"), md5(col("norm")).as("digest"),
        length(col("norm")).as("n_norm"))
      .orderBy("doc_id")

  /** BPE merge training on the corpus: the first 8 learned merges with
    * their pair counts. The training loop (argmax + greedy merge rounds)
    * has no SQL form — rows-only in the driver gate; BpeSpec certifies
    * bit-exact equality with a single-node reference implementation.
    */
  private def textBpe(s: SparkSession, d: String): DataFrame = {
    val (merges, _) = graft.operators.Bpe.trainMerges(
      graft.operators.Bpe.wordCounts(t(s, d, "documents"), "text"), k = 8)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((a, b, c), i) => (i, a, b, c) }
      .toDF("rank", "left", "right", "c")
  }

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

  /** Timer-based streaming sessions (transformWithState, event-time
    * timers): the deterministic face — sessions closed by a LATER EVENT
    * of the key (≥ 30-min gap). Timer-closed sessions depend on the
    * final watermark and are certified in StreamingSpec instead.
    */
  private def streamTimer(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sess = graft.streaming.EventStreams.timedSessions(s,
        graft.streaming.EventStreams.readEvents(s, d))
      graft.streaming.EventStreams.runToMemory(s, sess.toDF(),
          s"stream_timer_${System.nanoTime()}", "update")
        .filter(col("closedBy") === "event")
        .select(col("userId").as("user_id"), col("ss"), col("se"), col("n"))
        .orderBy("user_id", "ss")
    } finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
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
    "dedup_quality" -> (dedupQuality _),
    "q83_funnel" -> (q83 _),
    "q84_negatives" -> (q84 _),
    "text_cooc" -> (textCooc _),
    "text_linededup" -> (textLineDedup _),
    "stream_tws" -> (streamTws _),
    "text_chunks" -> (textChunks _),
    "text_boilerplate" -> (textBoilerplate _),
    "q85_temperature" -> (q85 _),
    "q86_budget" -> (q86 _),
    "q87_outliers" -> (q87 _),
    "q88_overlap" -> (q88 _),
    "q89_fuzzy" -> (q89 _),
    "q90_qnorm" -> (q90 _),
    "text_rrf" -> (textRrf _),
    "q91_attrition" -> (q91 _),
    "q92_project" -> (q92 _),
    "q93_psi" -> (q93 _),
    "q94_shards" -> (q94 _),
    "q95_skew" -> (q95 _),
    "stream_static" -> (streamStatic _),
    "q96_folds" -> (q96 _),
    "text_normalize" -> (textNormalize _),
    "text_bpe" -> (textBpe _),
    "q97_exists" -> (q97 _),
    "stream_timer" -> (streamTimer _),
    "q98_setops_all" -> (q98 _),
    "q99_recursive" -> (q99 _),
    "q100_nullsafe" -> (q100 _),
    "q101_variant" -> (q101 _),
    "text_pmi" -> (textPmi _),
    "text_diversity" -> (textDiversity _),
    "text_decontaminate" -> (textDecontaminate _),
    "text_despan" -> (textDespan _),
    "text_selfdedup" -> (textSelfDedup _),
    "q_approx_quantile" -> (qApproxQuantile _),
    "stream_dedup" -> (streamDedup _),
    "stream_index_dedup" -> (streamIndexDedup _),
    "stream_sliding" -> (streamSliding _),
    "stream_session" -> (streamSession _),
    "stream_state" -> (streamState _),
    "stream_join" -> (streamJoin _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_index" -> (dedupIndex _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_corpus" -> (dedupCorpus _),
    "ann_topk" -> (annTopk _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_ivf_index" -> (annIvfIndex _),
    "ann_pq" -> (annPq _),
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _),
    "text_tfidf" -> (textTfidf _),
    "text_repetition" -> (textRepetition _),
    "text_lm_score" -> (textLmScore _),
    "text_redact" -> (textRedact _),
    "text_spans" -> (textSpans _),
    "text_bm25" -> (textBm25 _),
    "text_winnow" -> (textWinnow _),
    "mm_features" -> (mmFeatures _),
    "stream_tumbling" -> (streamTumbling _),
    "q_hll" -> (qHll _))

  // ------------------------------------------------------------- oracles --

  /** Shared DuckDB fragment: distinct 3-gram shingle sets per document. */
  private val duckShingles =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
      |                   for i in range(1, len(l)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      |), pj AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j,
      |    len(list_intersect(a.s, b.s)) * 1.0
      |      / len(list_distinct(a.s || b.s)) AS jac
      |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
      |)
      |SELECT i, j, ROUND(jac, 3) AS jac FROM pj WHERE jac >= 0.8
      |ORDER BY i, j""".stripMargin

  private val duckAnnTopk =
    """WITH q AS (
      |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id < 5
      |), scored AS (
      |  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim
      |  FROM embeddings e, q WHERE e.vec_id <> q.qid
      |), ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM scored
      |)
      |SELECT query_id, rnk, neighbor_id, ROUND(sim, 3) AS sim
      |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  private val duckMarkers: Map[String, String] = Map(
    "en" -> "['the','a','of','and','to','is']",
    "es" -> "['el','la','de','los','que','y']",
    "fr" -> "['le','la','et','les','des','un']",
    "de" -> "['der','die','und','das','ist','ein']")

  private def duckScore(lang: String): String =
    s"len(list_filter(toks, t -> list_contains(${duckMarkers(lang)}, t)))"

  def oracleSql: Map[String, String] = Map(
    "q01_sum_count" ->
      "SELECT ROUND(SUM(l_quantity), 1) AS s, COUNT(*) AS c FROM lineitem",
    "q02_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS rev,
        |  ROUND(SUM(l_quantity), 1) AS sum_qty, COUNT(*) AS c
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY 1""".stripMargin,
    "q05_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q06_topk" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS p
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q07_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey AS k FROM orders ORDER BY 1""".stripMargin,
    "q08_ts_filter" ->
      """SELECT event_type, COUNT(*) AS c, ROUND(SUM(value), 2) AS v
        |FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_hour_bucket" ->
      """SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
        |  COUNT(*) AS c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_json_get" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kb,
        |  COUNT(*) AS c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_distinct_agg" ->
      """SELECT lang, COUNT(DISTINCT source) AS ds,
        |  CAST(SUM(n_chars) AS BIGINT) AS ch
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_dup_groups" ->
      """SELECT doc_id, text FROM (
        |  SELECT doc_id, text, COUNT(*) OVER (PARTITION BY text) AS cnt
        |  FROM documents)
        |WHERE cnt > 1 ORDER BY doc_id""".stripMargin,
    "q13_cosine_top1" ->
      """SELECT b.vec_id FROM embeddings a, embeddings b
        |WHERE a.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                CAST(b.embedding AS DOUBLE[])) DESC,
        |         b.vec_id
        |LIMIT 1""".stripMargin,
    "q14_token_topk" ->
      """SELECT token, COUNT(*) AS c FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY 1 ORDER BY c DESC, token LIMIT 20""".stripMargin,
    "q15_crawl" ->
      "SELECT CAST(SUM(data) AS BIGINT) AS s FROM read_json_auto('/root/reference/tests/**/*.json')",
    "q16_monoid" ->
      "SELECT ROUND(SUM(l_quantity), 1) AS s FROM lineitem",
    "q17_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  ROUND(SUM(l_quantity), 1) AS qty, COUNT(*) AS c
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q18_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |  COALESCE(o_orderpriority, 'ALL') AS pri,
        |  ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin,
    "q19_except" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS k FROM customer
        |EXCEPT SELECT CAST(s_nationkey AS INTEGER) AS k FROM supplier
        |ORDER BY 1""".stripMargin,
    "q20_scalar_funcs" ->
      """SELECT o_orderkey, UPPER(o_orderstatus) AS st,
        |  SUBSTRING(o_orderpriority, 1, 3) AS pri,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(FLOOR(ABS(o_totalprice) / 100.0) AS BIGINT) AS hundredths,
        |  o_orderstatus || '-' || o_orderpriority AS tag
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q21_sliding_window" ->
      """SELECT CAST(FLOOR(epoch(ts) / 300) * 300 - i.i * 300 AS BIGINT) AS ws,
        |  COUNT(*) AS c
        |FROM events, (SELECT 0 AS i UNION ALL SELECT 1) i
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e
        |)
        |SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS ss,
        |  COUNT(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ss""".stripMargin,
    "q23_asof_join" ->
      """SELECT e.event_id,
        |  (SELECT MAX(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id
        |     AND o.o_orderdate = (SELECT MAX(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS o_orderkey
        |FROM events e ORDER BY e.event_id""".stripMargin,
    "q24_range_join" ->
      """SELECT band, COUNT(*) AS c, ROUND(SUM(value), 2) AS v
        |FROM events
        |JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
        |             (150.0, 1000000000.0, 'high')) b(lo, hi, band)
        |  ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q25_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY 1""".stripMargin,
    "q28_pivot" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q30_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  ROUND(var_samp(l_quantity), 2) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS cr,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cv
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
        |    AS n_orders
        |FROM customer c ORDER BY c_custkey""".stripMargin,
    "q32_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS names,
        |  COUNT(*) AS c
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q41_minmax_by" ->
      """SELECT o_orderstatus,
        |  arg_max(o_orderdate, o_orderkey) AS latest_key_date,
        |  arg_min(o_orderdate, o_orderkey) AS first_key_date,
        |  ROUND(MAX(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_cond_agg" ->
      """SELECT event_type,
        |  COUNT(*) FILTER (WHERE value > 100.0) AS n_big,
        |  ROUND(SUM(value) FILTER (WHERE value > 100.0), 2) AS v_big,
        |  ROUND(SUM(value) FILTER (WHERE value <= 100.0), 2) AS v_small
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_regex_null" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cnum,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin,
    "q44_like_scan" ->
      """SELECT p_brand, COUNT(*) AS c,
        |  ROUND(SUM(p_retailprice), 2) AS sum_price,
        |  CAST(MAX(p_size) AS BIGINT) AS max_size
        |FROM part
        |WHERE p_type LIKE '%ECO%' OR p_name LIKE 'red%'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_asof_bucketed" ->
      """SELECT e.event_id,
        |  (SELECT MAX(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id
        |     AND o.o_orderdate = (SELECT MAX(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS o_orderkey
        |FROM events e ORDER BY e.event_id""".stripMargin,
    "q52_group_split" ->
      """WITH per AS (
        |  SELECT source, COUNT(DISTINCT split) AS nsplits, COUNT(*) AS ndocs,
        |    MIN(split) AS split
        |  FROM (SELECT source,
        |          CASE WHEN md5(source) < '8' THEN 'train' ELSE 'val' END AS split
        |        FROM documents)
        |  GROUP BY source
        |)
        |SELECT split, COUNT(*) AS n_sources, CAST(SUM(ndocs) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN nsplits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS crossing
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q53_domain_cap" ->
      """SELECT source, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents
        |) WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin,
    "q54_resample" ->
      """WITH span AS (
        |  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
        |         CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders
        |), days AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span
        |), ks AS (SELECT DISTINCT o_orderpriority FROM orders
        |), cnt AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT k.o_orderpriority, strftime(d.day, '%Y-%m-%d') AS day,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |FROM ks k CROSS JOIN days d
        |LEFT JOIN cnt c ON c.o_orderpriority = k.o_orderpriority AND c.day = d.day
        |ORDER BY 1, 2""".stripMargin,
    "q55_full_outer" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
        |  WHERE c_acctbal > 9900 GROUP BY 1
        |), s AS (
        |  SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
        |  WHERE s_acctbal > 9000 GROUP BY 1
        |)
        |SELECT CAST(COALESCE(c.nk, s.nk) AS INTEGER) AS nk, c.n_cust, s.n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "q56_range_frame" ->
      """SELECT event_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(FLOOR(value) AS BIGINT)) OVER w AS BIGINT) AS f_1h
        |FROM (SELECT event_id, user_id,
        |        CAST(FLOOR(epoch(ts)) AS BIGINT) AS uts, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY uts
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q57_stratified" ->
      """SELECT lang, COUNT(*) AS n, MIN(doc_id) AS mn, MAX(doc_id) AS mx
        |FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  CASE WHEN lang = 'en' THEN '8' ELSE '4' END
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q58_centroids" ->
      """SELECT label, idx, ROUND(AVG(v), 6) AS mean, COUNT(*) AS n FROM (
        |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
        |         unnest(range(0, len(embedding))) AS idx
        |  FROM embeddings
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q59_mode" ->
      """SELECT l_returnflag, q AS mode_qty, c AS n FROM (
        |  SELECT l_returnflag, q, c,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY c DESC, q) AS rn
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |          COUNT(*) AS c
        |        FROM lineitem GROUP BY 1, 2)
        |) WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q60_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, ROUND(MIN(o_totalprice), 2) AS lo,
        |  ROUND(MAX(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q61_quantize" ->
      """WITH tall AS (
        |  SELECT unnest(range(0, len(embedding))) AS idx,
        |         unnest(CAST(embedding AS DOUBLE[])) AS v
        |  FROM embeddings
        |), st AS (SELECT idx, MIN(v) AS lo, MAX(v) AS hi FROM tall GROUP BY 1),
        |coded AS (
        |  SELECT t.idx, t.v, st.lo, st.hi,
        |    CASE WHEN st.hi = st.lo THEN 0
        |         ELSE LEAST(CAST(FLOOR((t.v - st.lo) / (st.hi - st.lo) * 256) AS BIGINT),
        |                    255) END AS code
        |  FROM tall t JOIN st USING (idx)
        |), e AS (
        |  SELECT idx, lo, hi, code,
        |    v - (lo + (code + 0.5) * (hi - lo) / 256.0) AS err
        |  FROM coded
        |)
        |SELECT idx, ROUND(MIN(lo), 6) AS lo, ROUND(MAX(hi), 6) AS hi,
        |  ROUND(AVG(err * err), 8) AS mse,
        |  ROUND(MAX(ABS(err)), 6) AS max_abs_err,
        |  CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q62_pack" ->
      """WITH base AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        |  FROM documents
        |), nz AS (SELECT * FROM base WHERE tok > 0),
        |placed AS (
        |  SELECT shard, doc_id, tok,
        |    SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id) AS e
        |  FROM nz
        |), seqs AS (
        |  SELECT shard, tok,
        |    (e - tok) // 512 AS first_seq, (e - 1) // 512 AS last_seq
        |  FROM placed
        |)
        |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |  CAST(MAX(last_seq) + 1 AS BIGINT) AS n_seqs,
        |  CAST(SUM(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_split_docs,
        |  CAST(CAST(SUM(tok) AS BIGINT) * 1000000
        |       // ((MAX(last_seq) + 1) * 512) AS BIGINT) AS fill_ppm
        |FROM seqs GROUP BY shard ORDER BY shard""".stripMargin,
    "q63_binpack" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        |  FROM documents
        |), nz AS (
        |  SELECT shard, doc_id, tok,
        |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM base WHERE tok > 0
        |), walk AS (
        |  SELECT shard, rn, tok, tok AS fill, CAST(0 AS BIGINT) AS bin
        |  FROM nz WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn, n.tok,
        |    CASE WHEN w.fill + n.tok > 512 THEN n.tok ELSE w.fill + n.tok END,
        |    CASE WHEN w.fill + n.tok > 512 THEN w.bin + 1 ELSE w.bin END
        |  FROM walk w JOIN nz n ON n.shard = w.shard AND n.rn = w.rn + 1
        |)
        |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |  CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
        |  CAST(SUM(CASE WHEN tok > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
        |  CAST(CAST(SUM(LEAST(tok, 512)) AS BIGINT) * 1000000
        |       // ((MAX(bin) + 1) * 512) AS BIGINT) AS fill_ppm
        |FROM walk GROUP BY shard ORDER BY shard""".stripMargin,
    "q64_upsert" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |), base AS (
        |  SELECT * FROM o WHERE o_orderkey % 3 <> 0
        |), batch AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    o_totalprice + 100000.0 AS o_totalprice
        |  FROM o WHERE o_orderkey % 2 = 0
        |), merged AS (
        |  SELECT * FROM batch
        |  UNION ALL
        |  SELECT * FROM base
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
        |)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS tot
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q65_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey % 40 AS src, o_orderkey % 40 AS dst
        |  FROM orders WHERE o_custkey % 40 <> o_orderkey % 40
        |), deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
        |n AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e),
        |nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM n),
        |r0 AS (SELECT v, 1.0 / nc.n AS pr FROM n, nc),
        |c1 AS (SELECT e.dst AS v, SUM(r.pr / deg.d) AS c
        |       FROM e JOIN deg USING (src) JOIN r0 r ON r.v = e.src GROUP BY 1),
        |r1 AS (SELECT n.v, 0.15 / nc.n + 0.85 * COALESCE(c1.c, 0) AS pr
        |       FROM n CROSS JOIN nc LEFT JOIN c1 ON c1.v = n.v),
        |c2 AS (SELECT e.dst AS v, SUM(r.pr / deg.d) AS c
        |       FROM e JOIN deg USING (src) JOIN r1 r ON r.v = e.src GROUP BY 1),
        |r2 AS (SELECT n.v, 0.15 / nc.n + 0.85 * COALESCE(c2.c, 0) AS pr
        |       FROM n CROSS JOIN nc LEFT JOIN c2 ON c2.v = n.v),
        |c3 AS (SELECT e.dst AS v, SUM(r.pr / deg.d) AS c
        |       FROM e JOIN deg USING (src) JOIN r2 r ON r.v = e.src GROUP BY 1),
        |r3 AS (SELECT n.v, 0.15 / nc.n + 0.85 * COALESCE(c3.c, 0) AS pr
        |       FROM n CROSS JOIN nc LEFT JOIN c3 ON c3.v = n.v)
        |SELECT v, ROUND(pr, 6) AS pr FROM r3 ORDER BY v""".stripMargin,
    "q66_triangles" ->
      """WITH r AS (
        |  SELECT o_custkey % 500 AS s, o_orderkey % 500 AS d FROM orders
        |), e AS (
        |  SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
        |  FROM r WHERE s <> d
        |), tr AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), v AS (
        |  SELECT x AS v FROM tr UNION ALL SELECT y FROM tr
        |  UNION ALL SELECT z FROM tr
        |)
        |SELECT v, COUNT(*) AS tri FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q67_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id % 50 = 0
        |), m AS (
        |  SELECT user_id, event_id, event_type, us,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev
        |  FROM e
        |), c AS (
        |  SELECT user_id, event_id, event_type, us FROM m
        |  WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, event_id, event_type, us AS ef,
        |  LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS et
        |FROM c ORDER BY user_id, ef, event_id""".stripMargin,
    "q68_vocab_encode" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents
        |), vc AS (
        |  SELECT token, COUNT(*) AS c FROM tok GROUP BY 1
        |), vocab AS (
        |  SELECT token, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS id
        |  FROM (SELECT * FROM vc ORDER BY c DESC, token LIMIT 20)
        |)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(SUM(COALESCE(v.id, 0)) AS BIGINT) AS id_sum
        |FROM tok t LEFT JOIN vocab v USING (token)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q69_winsorize" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |), cap AS (
        |  SELECT source, n_chars AS cap FROM r
        |  WHERE rn = CAST(CEIL(0.9 * n) AS BIGINT)
        |)
        |SELECT d.source, MAX(cap.cap) AS cap,
        |  CAST(SUM(CASE WHEN d.n_chars > cap.cap THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_capped,
        |  CAST(SUM(LEAST(d.n_chars, cap.cap)) AS BIGINT) AS tot
        |FROM documents d JOIN cap USING (source)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q70_global_ids" ->
      """SELECT source, doc_id,
        |  ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS gid
        |FROM documents ORDER BY gid""".stripMargin,
    "q71_digest" ->
      """SELECT source, COUNT(*) AS n,
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    CAST(doc_id AS VARCHAR) || '|' || text), 1, 8)) AS BIGINT))
        |    AS BIGINT) AS digest
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q72_profile" ->
      """SELECT 'doc_id' AS col_name, COUNT(*) AS n,
        |  COUNT(*) - COUNT(doc_id) AS n_null,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_s,
        |  CAST(MAX(doc_id) AS VARCHAR) AS max_s
        |FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
        |  COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR),
        |  CAST(MAX(lang) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
        |  COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR),
        |  CAST(MAX(source) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
        |  COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
        |  CAST(MAX(n_chars) AS VARCHAR) FROM documents
        |ORDER BY col_name""".stripMargin,
    "q74_importance" ->
      """SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) / 4294967296.0
        |      < GREATEST(LEAST(CAST(n_chars AS DOUBLE) / 600.0, 1.0), 0.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q84_negatives" ->
      """WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
        |drawn AS (
        |  SELECT a.vec_id, CAST(j AS INT) AS neg_idx,
        |    CAST(floor(
        |      CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR) || ':'
        |            || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 * n.n) AS BIGINT) AS raw,
        |    n.n AS nn
        |  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 20) a, n,
        |       generate_series(0, 3) AS t(j)
        |)
        |SELECT vec_id, neg_idx,
        |  CASE WHEN raw = vec_id THEN (raw + 1) % nn ELSE raw END AS neg_id
        |FROM drawn ORDER BY vec_id, neg_idx""".stripMargin,
    "q83_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE ts IS NOT NULL
        |), g AS (
        |  SELECT user_id, event_type, sec,
        |    sec - LAG(sec) OVER (PARTITION BY user_id
        |                         ORDER BY ts, event_id) AS gap,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM e
        |), s AS (
        |  SELECT user_id, event_type, sec,
        |    CAST(SUM(CASE WHEN gap IS NULL OR gap >= 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM g
        |), per AS (
        |  SELECT user_id, session_idx,
        |    MIN(CASE WHEN event_type = 'click' THEN sec END) AS fc,
        |    MAX(CASE WHEN event_type = 'purchase' THEN sec END) AS lp
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  COUNT(*) FILTER (WHERE fc IS NOT NULL AND lp IS NOT NULL
        |                     AND lp >= fc) AS n_converted
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q81_star" ->
      """SELECT n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |  COUNT(*) AS c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q82_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'
        |), anchored AS (
        |  SELECT user_id,
        |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |                                  ORDER BY day) AS INTEGER) AS anchor
        |  FROM d
        |), islands AS (
        |  SELECT user_id, anchor, COUNT(*) AS len
        |  FROM anchored GROUP BY 1, 2
        |)
        |SELECT user_id, MAX(len) AS streak, COUNT(*) AS n_islands,
        |  CAST(SUM(len) AS BIGINT) AS n_days
        |FROM islands GROUP BY 1 ORDER BY 1""".stripMargin,
    "q78_cdc" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS v
        |  FROM orders
        |), chg AS (
        |  SELECT l_orderkey AS k, l_returnflag AS status,
        |    l_extendedprice AS v, l_shipdate AS ts, l_linenumber AS tie,
        |    CASE WHEN l_linenumber % 4 = 0 THEN 'delete'
        |         ELSE 'upsert' END AS op
        |  FROM lineitem
        |), net AS (
        |  SELECT k, status, v, op FROM (
        |    SELECT k, status, v, op,
        |      ROW_NUMBER() OVER (PARTITION BY k
        |                         ORDER BY ts DESC, tie DESC,
        |                                  v DESC, status DESC) AS rn
        |    FROM chg) WHERE rn = 1
        |), applied AS (
        |  SELECT b.k, b.status, b.v FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM net n WHERE n.k = b.k)
        |  UNION ALL
        |  SELECT k, status, v FROM net WHERE op <> 'delete'
        |)
        |SELECT k % 10 AS bucket, COUNT(*) AS n, ROUND(SUM(v), 2) AS v
        |FROM applied GROUP BY 1 ORDER BY 1""".stripMargin,
    "q79_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE ts IS NOT NULL
        |), g AS (
        |  SELECT user_id, sec,
        |    sec - LAG(sec) OVER (PARTITION BY user_id
        |                         ORDER BY ts, event_id) AS gap,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM e
        |), s AS (
        |  SELECT user_id, sec,
        |    CAST(SUM(CASE WHEN gap IS NULL OR gap >= 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM g
        |)
        |SELECT user_id, session_idx, COUNT(*) AS n,
        |  MAX(sec) - MIN(sec) AS dur_s
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q80_url" ->
      """WITH u AS (
        |  SELECT doc_id, source || '.example.com' AS host,
        |    '/docs/' || CAST(doc_id AS VARCHAR) AS path, lang
        |  FROM documents
        |)
        |SELECT host, lang, COUNT(*) AS n, MIN(path) AS p0
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q77_ewma" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id < 5 AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |), walk AS (
        |  SELECT user_id, event_id, rn, v AS s FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT q.user_id, q.event_id, q.rn,
        |    0.3 * q.v + (1.0 - 0.3) * w.s AS s
        |  FROM seq q JOIN walk w
        |    ON q.user_id = w.user_id AND q.rn = w.rn + 1
        |)
        |SELECT user_id, event_id, ROUND(s, 6) AS ewma FROM walk
        |ORDER BY user_id, event_id""".stripMargin,
    "q76_weighted" ->
      """WITH pri AS (
        |  SELECT source, doc_id,
        |    ROUND(POWER(
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) / 4294967296.0,
        |      1.0 / CAST(n_chars AS DOUBLE)), 12) AS p
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |), ranked AS (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY p DESC, doc_id) AS rn
        |  FROM pri
        |)
        |SELECT source, doc_id FROM ranked WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,
    "q75_standardize" ->
      """WITH tall AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS idx,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM (SELECT vec_id, embedding,
        |          CAST(unnest(generate_series(1, len(embedding))) AS BIGINT)
        |            AS i
        |        FROM embeddings)
        |), stats AS (
        |  SELECT idx, AVG(v) AS mean, STDDEV_POP(v) AS std
        |  FROM tall GROUP BY idx
        |)
        |SELECT t.vec_id, t.idx,
        |  ROUND(CASE WHEN s.std = 0 THEN 0.0
        |             ELSE (t.v - s.mean) / s.std END, 4) AS z
        |FROM tall t JOIN stats s USING (idx)
        |WHERE t.vec_id < 5 ORDER BY vec_id, idx""".stripMargin,
    "q73_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS p, o_totalprice AS v
        |  FROM orders
        |), b AS (
        |  SELECT * FROM o WHERE k % 7 <> 0
        |), a AS (
        |  SELECT k, p, CASE WHEN k % 2 = 0 THEN v + 1 ELSE v END AS v
        |  FROM o WHERE k % 3 <> 0
        |)
        |SELECT status, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN b.k IS NULL THEN 'added'
        |              WHEN a.k IS NULL THEN 'removed'
        |              WHEN a.p IS DISTINCT FROM b.p
        |                OR a.v IS DISTINCT FROM b.v THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM b FULL OUTER JOIN a ON a.k = b.k
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_linededup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), lined AS (
        |  SELECT doc_id, array_to_string(
        |    list_transform(generate_series(1, GREATEST(len(toks), 1), 10),
        |      s -> array_to_string(toks[s:s+9], ' ')), chr(10)) AS text
        |  FROM base
        |), lines AS (
        |  SELECT doc_id, i, l[i] AS line
        |  FROM (SELECT doc_id, l,
        |          CAST(unnest(generate_series(1, len(l))) AS INT) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10)) AS l
        |              FROM lined))
        |), flagged AS (
        |  SELECT doc_id, i, line,
        |    CASE WHEN TRIM(line) = '' THEN TRUE
        |         ELSE ROW_NUMBER() OVER (PARTITION BY line
        |                                 ORDER BY doc_id, i) = 1
        |    END AS keep
        |  FROM lines
        |)
        |SELECT doc_id,
        |  COUNT(*) FILTER (WHERE keep) AS n_kept,
        |  COUNT(*) FILTER (WHERE NOT keep) AS n_removed,
        |  md5(COALESCE(array_to_string(
        |    list(line ORDER BY i) FILTER (WHERE keep), chr(10)), '')) AS digest
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), lined AS (
        |  SELECT doc_id, array_to_string(
        |    list_transform(generate_series(1, GREATEST(len(toks), 1), 10),
        |      s -> array_to_string(toks[s:s+9], ' ')), chr(10)) AS text
        |  FROM base
        |), lines AS (
        |  SELECT doc_id, i, l[i] AS line
        |  FROM (SELECT doc_id, l,
        |          CAST(unnest(generate_series(1, len(l))) AS INT) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10)) AS l
        |              FROM lined))
        |), boiler AS (
        |  SELECT line FROM lines WHERE TRIM(line) <> ''
        |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3
        |), flagged AS (
        |  SELECT doc_id, i, line,
        |    (TRIM(line) = '' OR line NOT IN (SELECT line FROM boiler)) AS keep
        |  FROM lines
        |)
        |SELECT doc_id,
        |  COUNT(*) FILTER (WHERE keep) AS n_kept,
        |  COUNT(*) FILTER (WHERE NOT keep) AS n_removed,
        |  md5(COALESCE(array_to_string(
        |    list(line ORDER BY i) FILTER (WHERE keep), chr(10)), '')) AS digest
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q85_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |r AS (
        |  SELECT lang, ROUND(POWER(CAST(n AS DOUBLE)
        |    / (SELECT MIN(n) FROM c), -0.5), 6) AS rate
        |  FROM c
        |)
        |SELECT d.lang, COUNT(*) AS n_kept,
        |  CAST(SUM(d.doc_id) AS BIGINT) AS id_sum, MAX(r.rate) AS rate
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) / 4294967296.0
        |      < r.rate
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q86_budget" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents
        |)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM c WHERE cum <= 75000 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q87_outliers" ->
      """WITH v AS (
        |  SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM v
        |), med AS (
        |  SELECT event_type, value AS med FROM r
        |  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
        |), dev AS (
        |  SELECT v.event_type, v.event_id, ABS(v.value - m.med) AS dv, m.med
        |  FROM v JOIN med m USING (event_type)
        |), r2 AS (
        |  SELECT event_type, dv,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM dev
        |), mad AS (
        |  SELECT event_type, dv AS mad FROM r2
        |  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
        |)
        |SELECT d.event_type, ROUND(MAX(d.med), 6) AS med,
        |  ROUND(MAX(m.mad), 6) AS mad,
        |  COUNT(*) FILTER (WHERE d.dv > 3 * m.mad) AS n_out,
        |  CAST(SUM(d.event_id) FILTER (WHERE d.dv > 3 * m.mad) AS BIGINT)
        |    AS out_ids
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_rrf" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), dl AS (SELECT doc_id, len(toks) AS dl FROM base),
        |stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM base),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  WHERE term IN ('table', 'scan', 'join') GROUP BY 1, 2
        |), dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |    ROUND(SUM(
        |      ln(1.0 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
        |      tf.tf * (1.2 + 1.0) /
        |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
        |    ), 6) AS score
        |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY 1
        |), bmr AS (
        |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
        |  FROM scored QUALIFY r <= 50
        |), cosd AS (
        |  SELECT e.vec_id AS doc_id,
        |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
        |      AS cos
        |  FROM embeddings e,
        |    (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        |     WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0
        |), cr AS (
        |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r
        |  FROM cosd QUALIFY r <= 50
        |), u AS (
        |  SELECT doc_id, r FROM bmr UNION ALL SELECT doc_id, r FROM cr
        |)
        |SELECT doc_id, ROUND(SUM(CAST(1.0 AS DOUBLE) / (60 + r)), 9) AS rrf,
        |  COUNT(*) AS n_lists
        |FROM u GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q91_attrition" ->
      """SELECT COALESCE(CASE
        |    WHEN NOT COALESCE(strlen(text) > 0, FALSE) THEN 'nonempty'
        |    WHEN NOT COALESCE(lang = 'en', FALSE) THEN 'lang_en'
        |    WHEN NOT COALESCE(n_chars BETWEEN 150 AND 1500, FALSE)
        |      THEN 'len_band'
        |    WHEN NOT COALESCE(len(list_filter(string_split(text, ' '),
        |      t -> t <> '')) >= 30, FALSE) THEN 'min_tokens'
        |  END, 'survived') AS bucket,
        |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q92_project" ->
      """WITH tall AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS i,
        |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
        |), pr AS (
        |  SELECT vec_id, jj.j,
        |    SUM(qv * CASE WHEN substr(md5(concat(CAST(i AS VARCHAR), ':',
        |                                         CAST(jj.j AS VARCHAR))), 1, 1)
        |                       < '8'
        |             THEN 1 ELSE -1 END) AS p
        |  FROM tall CROSS JOIN
        |    (SELECT CAST(unnest(generate_series(0, 7)) AS INT) AS j) jj
        |  GROUP BY 1, 2
        |)
        |SELECT vec_id, j, CAST(p AS BIGINT) AS p FROM pr
        |ORDER BY 1, 2""".stripMargin,
    "stream_timer" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), b AS (
        |  SELECT user_id, tus,
        |    CASE WHEN LAG(tus) OVER w IS NULL
        |           OR tus - LAG(tus) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), g AS (
        |  SELECT user_id, tus,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b
        |), sess AS (
        |  SELECT user_id, MIN(tus) AS stus, MAX(tus) AS etus,
        |    COUNT(*) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY MIN(tus) DESC) AS rdesc
        |  FROM g GROUP BY user_id, sid
        |)
        |SELECT user_id, stus // 1000000 AS ss, etus // 1000000 AS se,
        |  CAST(n AS BIGINT) AS n
        |FROM sess WHERE rdesc > 1 ORDER BY user_id, ss""".stripMargin,
    "q97_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q98_setops_all" ->
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
        |ORDER BY op""".stripMargin,
    "q100_nullsafe" ->
      """WITH ev AS (
        |  SELECT CASE WHEN value < 1.0 THEN NULL
        |              ELSE CAST(FLOOR(value / 100.0) AS BIGINT) END AS k,
        |    event_id
        |  FROM events
        |), dim(k, label) AS (
        |  VALUES (NULL, 'missing'), (0, 'low'), (2, 'mid'), (4, 'high')
        |)
        |SELECT d.label, COUNT(*) AS n,
        |  CAST(SUM(ev.event_id) AS BIGINT) AS id_sum
        |FROM ev JOIN dim d ON ev.k IS NOT DISTINCT FROM d.k
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q101_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS ksum,
        |  MIN(CAST(json_extract(props, '$.k') AS INT)) AS kmin,
        |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS kmax
        |FROM events WHERE props IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q99_recursive" ->
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
        |SELECT v, CAST(MIN(d) AS INT) AS d, COUNT(*) AS paths
        |FROM reach GROUP BY v ORDER BY v""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '\s+', ' ', 'g'))) AS digest,
        |  CAST(strlen(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '\s+', ' ', 'g'))) AS INT) AS n_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q96_folds" ->
      """SELECT CAST(LEAST(4, FLOOR(
        |    CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
        |      / 4294967296.0 * 5)) AS BIGINT) AS fold,
        |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  COUNT(DISTINCT source) AS n_src
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q95_skew" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT SUM(n) AS t FROM c)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // t.t AS BIGINT) AS ppm
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "stream_static" ->
      """SELECT CAST(user_id % 3 AS INT) AS segment, event_type,
        |  COUNT(*) AS n
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q93_psi" ->
      """WITH b AS (
        |  SELECT GREATEST(-1, LEAST(20,
        |      CAST(FLOOR(value / 25.0) AS BIGINT))) AS bin,
        |    COUNT(*) AS n_before
        |  FROM events WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-15'
        |  GROUP BY 1
        |), a AS (
        |  SELECT GREATEST(-1, LEAST(20,
        |      CAST(FLOOR(value / 25.0) AS BIGINT))) AS bin,
        |    COUNT(*) AS n_after
        |  FROM events WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-15'
        |  GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(b.bin, a.bin) AS bin,
        |    COALESCE(n_before, 0) AS n_before, COALESCE(n_after, 0) AS n_after
        |  FROM b FULL OUTER JOIN a ON b.bin = a.bin
        |), tot AS (SELECT SUM(n_before) AS tb, SUM(n_after) AS ta FROM j)
        |SELECT j.bin, CAST(j.n_before AS BIGINT) AS n_before,
        |  CAST(j.n_after AS BIGINT) AS n_after,
        |  ROUND(((n_before + 0.5) / (tb + 11.0) - (n_after + 0.5) / (ta + 11.0))
        |    * ln(((n_before + 0.5) / (tb + 11.0))
        |          / ((n_after + 0.5) / (ta + 11.0))), 9) AS contrib
        |FROM j CROSS JOIN tot ORDER BY bin""".stripMargin,
    "q94_shards" ->
      """WITH w AS (
        |  SELECT doc_id, s,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(s AS VARCHAR)), 1, 8)) AS BIGINT) AS wt
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS s)
        |), pick AS (
        |  SELECT doc_id, CAST(s AS INT) AS shard,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY wt DESC, s DESC) AS rn
        |  FROM w
        |)
        |SELECT shard, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM pick WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q89_fuzzy" ->
      """WITH n AS (
        |  SELECT p_name AS nm, MIN(p_partkey) AS id FROM part GROUP BY 1
        |)
        |SELECT a.id AS i, b.id AS j,
        |  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |FROM n a JOIN n b
        |  ON a.id < b.id AND levenshtein(a.nm, b.nm) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "q90_qnorm" ->
      """WITH v AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT value AS gv, ROW_NUMBER() OVER (ORDER BY value) - 1 AS gid
        |  FROM v
        |), nn AS (SELECT COUNT(*) AS n FROM v),
        |r AS (
        |  SELECT event_type,
        |    RANK() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS ng
        |  FROM v
        |), p AS (
        |  SELECT event_type, rk * (nn.n - 1) // GREATEST(ng - 1, 1) AS pos
        |  FROM r, nn
        |)
        |SELECT p.event_type, ROUND(g.gv, 6) AS qn, COUNT(*) AS c
        |FROM p JOIN g ON p.pos = g.gid
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q88_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS lo,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) + CAST(FLOOR(value) AS BIGINT)
        |      AS hi
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |)
        |SELECT a.user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(a.event_id + b.event_id) AS BIGINT) AS pair_sum
        |FROM iv a JOIN iv b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND a.lo <= b.hi AND b.lo <= a.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_cooc" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), pos0 AS (
        |  SELECT doc_id, toks,
        |    CAST(unnest(generate_series(1, len(toks))) AS INT) AS i
        |  FROM base
        |), pos AS (
        |  SELECT doc_id, i, toks[i] AS tok FROM pos0
        |)
        |SELECT a.tok AS x, b.tok AS y, COUNT(*) AS c
        |FROM pos a JOIN pos b
        |  ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 3
        |GROUP BY 1, 2 HAVING COUNT(*) >= 50
        |ORDER BY c DESC, x, y LIMIT 30""".stripMargin,
    "text_chunks" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), st0 AS (
        |  SELECT doc_id, toks,
        |    CAST(unnest(generate_series(1, GREATEST(len(toks), 1), 6)) AS INT)
        |      AS s
        |  FROM base
        |)
        |SELECT doc_id, CAST((s - 1) / 6 AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(toks, s, s + 8 - 1)) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(list_slice(toks, s, s + 8 - 1), ' ')) AS digest
        |FROM st0 ORDER BY doc_id, chunk_id""".stripMargin,
    "text_pmi" ->
      """WITH base AS (
        |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), bi AS (
        |  SELECT unnest([toks[i] || ' ' || toks[i+1]
        |                 for i in range(1, len(toks))]) AS bg
        |  FROM base WHERE len(toks) >= 2
        |), uni AS (SELECT unnest(toks) AS tok FROM base),
        |bcnt AS (
        |  SELECT string_split(bg, ' ')[1] AS x, string_split(bg, ' ')[2] AS y,
        |    COUNT(*) AS cxy
        |  FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM uni) AS nt,
        |               (SELECT CAST(COUNT(*) AS DOUBLE) FROM bi) AS nb)
        |SELECT b.x, b.y, b.cxy,
        |  ROUND(LN(CAST(b.cxy AS DOUBLE) * t.nt * t.nt
        |           / (t.nb * ux.c * uy.c)), 6) AS pmi
        |FROM bcnt b
        |JOIN ucnt ux ON ux.tok = b.x
        |JOIN ucnt uy ON uy.tok = b.y
        |CROSS JOIN tot t
        |ORDER BY pmi DESC, x, y LIMIT 20""".stripMargin,
    "text_diversity" ->
      """WITH tc AS (
        |  SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT), 6) AS ttr,
        |  ROUND(LN(CAST(SUM(c) AS DOUBLE))
        |        - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
        |          / CAST(SUM(c) AS DOUBLE), 6) AS entropy
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
        |                   ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]
        |                   for i in range(1, len(l)-6)]) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS l
        |        FROM documents)
        |), hold AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 5)
        |SELECT sh.doc_id, CAST(COUNT(DISTINCT hold.g) AS BIGINT) AS n_shared
        |FROM sh JOIN hold ON list_contains(sh.s, hold.g)
        |WHERE sh.doc_id % 10 <> 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_despan" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    [struct_pack(pos := i, g := l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
        |     ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7])
        |     for i in range(1, len(l) - 6)] AS gs
        |  FROM base
        |), tall AS (
        |  SELECT doc_id, u.pos AS pos, u.g AS g
        |  FROM (SELECT doc_id, unnest(gs) AS u FROM sh)
        |), hold AS (SELECT DISTINCT g FROM tall WHERE doc_id % 10 = 5),
        |hits AS (
        |  SELECT t.doc_id, t.pos FROM tall t JOIN hold h ON t.g = h.g
        |  WHERE t.doc_id % 10 <> 5
        |), cov AS (
        |  SELECT doc_id, list(DISTINCT j) AS js
        |  FROM (SELECT doc_id, unnest(range(pos, pos + 8)) AS j FROM hits)
        |  GROUP BY doc_id
        |)
        |SELECT b.doc_id, CAST(len(cov.js) AS BIGINT) AS n_removed,
        |  md5(COALESCE(array_to_string(
        |    [b.l[k] for k in range(1, len(b.l) + 1)
        |     if NOT list_contains(cov.js, k)], ' '), '')) AS clean_digest
        |FROM base b JOIN cov ON b.doc_id = cov.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    // keep-first self-dedup: like text_despan but the "holdout" is each
    // gram's own first (min doc_id) occurrence
    "text_selfdedup" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    [struct_pack(pos := i, g := l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
        |     ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7])
        |     for i in range(1, len(l) - 6)] AS gs
        |  FROM base
        |), tall AS (
        |  SELECT doc_id, u.pos AS pos, u.g AS g
        |  FROM (SELECT doc_id, unnest(gs) AS u FROM sh)
        |), rep AS (
        |  SELECT g, MIN(doc_id) AS first_doc
        |  FROM tall GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
        |), hits AS (
        |  SELECT t.doc_id, t.pos FROM tall t JOIN rep r ON t.g = r.g
        |  WHERE t.doc_id <> r.first_doc
        |), cov AS (
        |  SELECT doc_id, list(DISTINCT j) AS js
        |  FROM (SELECT doc_id, unnest(range(pos, pos + 8)) AS j FROM hits)
        |  GROUP BY doc_id
        |)
        |SELECT b.doc_id, CAST(len(cov.js) AS BIGINT) AS n_removed,
        |  md5(COALESCE(array_to_string(
        |    [b.l[k] for k in range(1, len(b.l) + 1)
        |     if NOT list_contains(cov.js, k)], ' '), '')) AS clean_digest
        |FROM base b JOIN cov ON b.doc_id = cov.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q51_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q, COUNT(*) AS c
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q50_unpivot" ->
      """SELECT metric, ROUND(SUM(v), 2) AS sv, COUNT(*) AS c FROM (
        |  SELECT 'l_quantity' AS metric, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_lateral" ->
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
        |ORDER BY o.o_orderkey, l.p DESC, l.l_linenumber""".stripMargin,
    "q48_window_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |  ROUND(CUME_DIST() OVER w, 6) AS cd,
        |  NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_top
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q46_hash_split" ->
      """SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
        |            ELSE 'val' END AS split,
        |  COUNT(*) AS n, MIN(doc_id) AS mn, MAX(doc_id) AS mx
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q47_corpus_prep" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents
         |), feat AS (
         |  SELECT doc_id, text, toks,
         |    ${duckScore("en")} AS s_en, ${duckScore("es")} AS s_es,
         |    ${duckScore("fr")} AS s_fr, ${duckScore("de")} AS s_de
         |  FROM base
         |), scored AS (
         |  SELECT doc_id, text,
         |    CASE
         |      WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |      WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
         |      WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
         |      WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
         |      WHEN s_de > 0 THEN 'de'
         |      ELSE 'und'
         |    END AS lang,
         |    len(toks) AS n_tokens,
         |    ROUND(
         |      CASE WHEN len(toks) >= 10 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END * 0.4
         |      + (CASE WHEN length(text) = 0 THEN 0.0
         |              ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         |                   / length(text) END) * 0.2
         |      + (CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE CAST(len(list_filter(toks, t -> list_contains(
         |                ['the','a','of','and','to','is','el','la','de','los','que','y',
         |                 'le','et','les','des','un','der','die','und','das','ist','ein'],
         |                t))) AS DOUBLE) / len(toks) END) * 0.2
         |      + (CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END) * 0.2,
         |      3) AS q
         |  FROM feat
         |), filtered AS (
         |  SELECT doc_id, text, q FROM scored WHERE lang = 'en' AND n_tokens >= 10
         |), survivors AS (
         |  SELECT text, q, MIN(doc_id) AS doc_id FROM filtered GROUP BY text, q
         |), tagged AS (
         |  SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
         |              ELSE 'val' END AS split,
         |    doc_id, q
         |  FROM survivors
         |)
         |SELECT split, COUNT(*) AS n, MIN(doc_id) AS mn, MAX(doc_id) AS mx,
         |  ROUND(AVG(q), 3) AS avg_q
         |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // cumulative streamed pairs == full corpus closure (batch-boundary
    // invariance — see streamIndexDedup)
    "stream_index_dedup" -> duckShingles,
    "q33_sql_text" ->
      """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tok,
        |  CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER) AS has_spark,
        |  array_to_string(string_split(text, ' ')[1:3], '|') AS head3,
        |  string_split(text, ' ')[-1] AS last_tok,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q37_map_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
        |  CAST(len(json_keys(props)) AS INTEGER) AS nk
        |FROM events ORDER BY event_id""".stripMargin,
    "q38_month_agg" ->
      """SELECT CAST(FLOOR(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS mo,
        |  ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_string_funcs" ->
      """SELECT c_custkey,
        |  trim(lower(c_name)) AS lname,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  length(c_name) AS len,
        |  reverse(c_mktsegment) AS rseg
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin,
    "q40_topk_agg" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q35_union_all" ->
      """SELECT k, COUNT(*) AS c FROM (
        |  SELECT CAST(c_nationkey AS INTEGER) AS k FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS INTEGER) AS k FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_datediff" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "stream_state" ->
      """SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_tws" ->
      """SELECT user_id, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin,
    "stream_sliding" ->
      """SELECT CAST(FLOOR(epoch(ts) / 300) * 300 - i.i * 300 AS BIGINT) AS ws,
        |  COUNT(*) AS c
        |FROM events, (SELECT 0 AS i UNION ALL SELECT 1) i
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e
        |)
        |SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS ss,
        |  COUNT(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ss""".stripMargin,
    "q26_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q27_lag_diff" ->
      """SELECT event_id,
        |  ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), 2) AS dv
        |FROM events ORDER BY event_id""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n FROM documents
        |GROUP BY text ORDER BY doc_id""".stripMargin,
    "dedup_minhash" -> duckShingles,
    "dedup_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |    len(list_intersect(a.s, b.s)) * 1.0
        |      / len(list_distinct(a.s || b.s)) AS jac
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |)
        |SELECT i, j, ROUND(jac, 3) AS jac FROM pj
        |WHERE jac >= 0.8 AND j >= 400
        |ORDER BY i, j""".stripMargin,
    // the persistent-index probe answers the same question as
    // dedup_incremental (same split, same geometry) — shared oracle
    "dedup_index" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |    len(list_intersect(a.s, b.s)) * 1.0
        |      / len(list_distinct(a.s || b.s)) AS jac
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |)
        |SELECT i, j, ROUND(jac, 3) AS jac FROM pj
        |WHERE jac >= 0.8 AND j >= 400
        |ORDER BY i, j""".stripMargin,
    "dedup_corpus" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.s, b.s)) * 1.0
        |        / len(list_distinct(a.s || b.s)) >= 0.8
        |), e(a, b) AS (
        |  SELECT i, j FROM pj UNION SELECT j, i FROM pj
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS c FROM reach GROUP BY a
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> c)
        |ORDER BY doc_id""".stripMargin,
    "dedup_quality" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.s, b.s)) * 1.0
        |        / len(list_distinct(a.s || b.s)) >= 0.8
        |), e(a, b) AS (
        |  SELECT i, j FROM pj UNION SELECT j, i FROM pj
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS c FROM reach GROUP BY a
        |), ranked AS (
        |  SELECT comp.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY comp.c
        |                       ORDER BY d.n_chars DESC, comp.doc_id) AS rn
        |  FROM comp JOIN documents d ON d.doc_id = comp.doc_id
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
        |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" -> duckShingles,
    "dedup_ngram" -> duckShingles,
    "dedup_embedding" ->
      """SELECT a.vec_id AS i, b.vec_id AS j,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 3) AS sim
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.95
        |ORDER BY i, j""".stripMargin,
    "ann_topk" -> duckAnnTopk,
    "ann_ivf" -> duckAnnTopk,
    "ann_ivf_index" -> duckAnnTopk,
    // ann_pq stays rows-only by measured necessity — see the annPq
    // scaladoc: the fixture's near-uniform embeddings leave inter-rank
    // gaps (0.5–2 %) below the reconstruction error of ANY non-degenerate
    // codebook, so no tolerance oracle exists for ADC ranks here.
    "text_langid" ->
      s"""SELECT doc_id,
         |  CASE
         |    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
         |    WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
         |    WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
         |    WHEN s_de > 0 THEN 'de'
         |    ELSE 'und'
         |  END AS pred_lang
         |FROM (
         |  SELECT doc_id, text,
         |    ${duckScore("en")} AS s_en, ${duckScore("es")} AS s_es,
         |    ${duckScore("fr")} AS s_fr, ${duckScore("de")} AS s_de
         |  FROM (SELECT doc_id, text,
         |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |        FROM documents)
         |) ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(n_tok AS BIGINT) AS n_tokens,
        |  ROUND(alpha_ratio, 3) AS alpha_ratio,
        |  ROUND(stop_ratio, 3) AS stopword_ratio,
        |  ROUND(distinct_ratio, 3) AS distinct_ratio,
        |  ROUND(len_ok * 0.4 + alpha_ratio * 0.2 + stop_ratio * 0.2
        |        + distinct_ratio * 0.2, 3) AS quality_score
        |FROM (
        |  SELECT doc_id,
        |    len(toks) AS n_tok,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |              / length(text) END AS alpha_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(toks, t -> list_contains(
        |                ['the','a','of','and','to','is','el','la','de','los','que','y',
        |                 'le','et','les','des','un','der','die','und','das','ist','ein'],
        |                t))) AS DOUBLE) / len(toks) END AS stop_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END
        |      AS distinct_ratio,
        |    CASE WHEN len(toks) >= 10 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END
        |      AS len_ok
        |  FROM (SELECT doc_id, text,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |        FROM documents)
        |) ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split(text, ' '), t -> t <> ''))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_bm25" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), dl AS (SELECT doc_id, len(toks) AS dl FROM base),
        |stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM base),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  WHERE term IN ('table', 'scan', 'join') GROUP BY 1, 2
        |), dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |    ROUND(SUM(
        |      ln(1.0 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
        |      tf.tf * (1.2 + 1.0) /
        |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
        |    ), 6) AS score
        |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY 1
        |)
        |SELECT doc_id, score FROM scored
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    "text_spans" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), spans AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+9], ' ')
        |            for i in range(1, len(toks) - 8)]) AS ngram
        |  FROM base
        |)
        |SELECT ngram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
        |FROM spans GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1
        |ORDER BY n_docs DESC, n_occ DESC, ngram LIMIT 20""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9][0-9()\s.-]{7,}[0-9]', '<PHONE>', 'g')) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lm_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg
        |  FROM base
        |), bgw AS (
        |  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg
        |), c12 AS (SELECT bg, COUNT(*) AS c12 FROM bgw GROUP BY 1),
        |uni AS (SELECT unnest(toks) AS w FROM base),
        |c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM uni)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(AVG(ln(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + v.v))), 6) AS avg_logp
        |FROM bgw JOIN c12 USING (bg) JOIN c1 ON bgw.w1 = c1.w CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id,
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)] AS g
        |  FROM base
        |), dup AS (
        |  SELECT doc_id,
        |    ROUND(CASE WHEN len(g) = 0 THEN 0.0
        |               ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
        |          END, 6) AS dup_3gram_frac
        |  FROM gr
        |), tf AS (
        |  SELECT doc_id, t, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT doc_id,
        |    ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_frac
        |  FROM tf GROUP BY 1
        |)
        |SELECT dup.doc_id, dup_3gram_frac, top_token_frac
        |FROM dup JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT d.doc_id, lower(u.t) AS term
        |  FROM documents d, unnest(string_split_regex(d.text, '\s+')) AS u(t)
        |  WHERE regexp_matches(u.t, '^[A-Za-z0-9]+$')
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df) DESC,
        |        tf.term ASC) AS rnk
        |  FROM tf JOIN dfx USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, rnk, term, ROUND(score, 4) AS score
        |FROM ranked WHERE rnk <= 3 AND doc_id < 30
        |ORDER BY doc_id, rnk""".stripMargin,
    "mm_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "stream_tumbling" ->
      """SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS h, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)
}
