package graft

import graft.operators.{Ingest, Packing, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the newest operators: each
  * scaladoc's scale claim (narrow / single shuffle / broadcast side)
  * checked against what the planner actually emits, so a refactor that
  * silently introduces an extra exchange fails CI, not a 100 TB run.
  */
class PlanShapeSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 200L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("doc_id", "text")
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(plan(df)).length

  test("slidingChunks is fully narrow: zero exchanges") {
    assert(exchanges(Packing.slidingChunks(docs, "doc_id", "text", 4, 3)) == 0)
  }

  test("cooccurrence shuffles exactly once (the count aggregate)") {
    assert(exchanges(TextAnalysis.cooccurrence(docs, "text", 3)) == 1)
  }

  test("tableDigest shuffles exactly once, pre-reduced map-side") {
    val p = plan(Ingest.tableDigest(docs, Seq.empty, Seq("doc_id", "text")))
    assert("Exchange".r.findAllIn(p).length == 1)
    // partial + final aggregate pair = map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
  }

  test("materialized-agg partial fold shuffles once, pre-reduced map-side") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i % 9, i)).toDF("g", "v")
    val p = plan(graft.operators.MaterializedAgg.partial(rows, Seq("g"), Seq("v")))
    assert("Exchange".r.findAllIn(p).length == 1, p)
    // partial + final aggregate pair = map-side combine before the shuffle
    // (the monoid's fold/combine split, exactly the reference's O3/O4)
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
  }

  test("encode probes the vocabulary via broadcast, not a shuffle join") {
    val vocab = TextAnalysis.buildVocab(docs, "text", 5)
    val p = plan(TextAnalysis.encode(docs, "doc_id", "text", vocab))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("winsorize joins the cap table via broadcast") {
    import org.apache.spark.sql.functions.col
    val grouped = docs.withColumn("g", col("doc_id") % 5)
    val p = plan(Sampling.winsorize(grouped, Seq("g"), "doc_id", 0.9))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("join strategy hints override the planner's size-based choice") {
    import org.apache.spark.sql.functions.col
    val a = docs
    val b = docs.select(col("doc_id"), col("text").as("t2"))
    // both sides are tiny, so the default is a broadcast hash join...
    assert(plan(a.join(b, "doc_id")).contains("BroadcastHashJoin"))
    // ...but hints force the shuffle strategies a 100 TB join would need
    assert(plan(a.join(b.hint("shuffle_hash"), "doc_id"))
      .contains("ShuffledHashJoin"))
    assert(plan(a.join(b.hint("merge"), "doc_id"))
      .contains("SortMergeJoin"))
  }

  test("runtime bloom filter prunes the fact scan of a selective shuffle join") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Spark injects a bloom-filter runtime filter on the application
    // (fact) side when the creation side is selective — the shuffle-join
    // analogue of broadcast pruning, and the config we rely on at 100 TB.
    // Local fixture sizes sit below the production thresholds, so lower
    // them for the assertion; a shuffle join is forced the same way.
    val in = java.nio.file.Files.createTempDirectory("bloom").toString
    (0L until 200000L).map(i => (i, i % 100)).toDF("k", "v")
      .write.parquet(s"$in/fact")
    (0L until 100L).map(i => (i, i % 10)).toDF("k", "flag")
      .write.parquet(s"$in/dim")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$in/fact")
      val dim = spark.read.parquet(s"$in/dim").filter(col("flag") === 3)
      val joined = fact.join(dim, "k")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter in:\n$optimized")
      // dim keys 3,13,…,93 each match exactly one unique fact key
      assert(joined.count() == 10)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("temperatureSample joins rates via broadcast; the corpus never shuffles") {
    import org.apache.spark.sql.functions.col
    val grouped = docs.withColumn("g", (col("doc_id") % 5).cast("string"))
    val p = plan(Sampling.temperatureSample(grouped, "g", "doc_id", 0.5))
    assert(p.contains("BroadcastHashJoin"), p)
    // the only exchanges belong to the group-cardinality rate aggregation,
    // which sits on the broadcast (build) side — never on the probe side
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("intervalOverlap and editDistanceJoin plan equi-joins, never a cross product") {
    import org.apache.spark.sql.functions.col
    val iv = docs.select(col("doc_id").as("id"), (col("doc_id") % 50).as("k"),
      (col("doc_id") * 3 % 997).as("lo"))
      .withColumn("hi", col("lo") + 40)
    val pOverlap = plan(graft.operators.RangeJoin.intervalOverlap(
      iv, iv, Seq("k"), "lo", "hi", bucketWidth = 50L))
    assert(!pOverlap.contains("CartesianProduct") &&
      !pOverlap.contains("BroadcastNestedLoopJoin"), pOverlap)
    val named = docs.select(col("doc_id").as("id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("name "), col("text")).as("s"))
    val pFuzzy = plan(graft.operators.FuzzyJoin.editDistanceJoin(
      named, "id", "s", k = 2, q = 2))
    assert(!pFuzzy.contains("CartesianProduct") &&
      !pFuzzy.contains("BroadcastNestedLoopJoin"), pFuzzy)
  }

  test("nearDupPairs: banded equi-join, never a cross product") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val hashes = (0L until 100L)
      .map(i => (i, (i % 7).toInt, (i % 11).toInt, (i % 13).toInt, (i % 5).toInt))
      .toDF("id", "b0", "b1", "b2", "b3")
    val p = plan(graft.operators.Multimodal.nearDupPairs(hashes, maxHamming = 3))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("crossJaccardPairs: equi-joins throughout, never a cross product") {
    import org.apache.spark.sql.functions.col
    val left = docs
    val right = docs.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val p = plan(graft.operators.Dedup.crossJaccardPairs(
      left, right, "doc_id", "text"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    graft.operators.Dedup.releaseCaches()
  }

  test("pointInTime shuffles once: the shared union-window partitioning") {
    import org.apache.spark.sql.functions.col
    val dim = docs.select(col("doc_id").as("k"),
        (col("doc_id") * 10).as("effective_from"))
      .withColumn("effective_to", col("effective_from") + 10)
      .withColumn("status", col("k") % 3)
    val facts = docs.select(col("doc_id").as("k"), (col("doc_id") * 7).as("t"))
    // facts ∪ versions into ONE hash partitioning on the key; the prefix
    // scan and the gap check add no further exchange — the property that
    // makes PIT enrichment an as-of, not an interval join
    assert(exchanges(Ingest.pointInTime(facts, dim, "k", "t",
      Seq("status"))) == 1)
  }

  test("quantileNormalize: the only nested-loop is the broadcast 1-row N count") {
    import org.apache.spark.sql.functions.col
    val grouped = docs.withColumn("g", (col("doc_id") % 5).cast("string"))
      .withColumn("v", col("doc_id") % 37)
    val p = plan(Sampling.quantileNormalize(grouped, Seq("g"), "v"))
    assert(!p.contains("CartesianProduct"), p)
    // the N-count crossJoin must stay a broadcast of ONE row, nothing bigger
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p)
  }

  test("dedup signature kernels stay inside WholeStageCodegen (no CodegenFallback)") {
    import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
    import org.apache.spark.sql.functions._
    import graft.plans.{MinHashBands, MinHashSig, ShingleHashes, SimHashSig, SrpBuckets}
    // CollapseCodegenStages refuses to fuse a Project containing ANY
    // CodegenFallback expression, so "the kernel projection's Project sits
    // inside a WholeStageCodegenExec" is exactly the regression signal for
    // an interpreted-only kernel sneaking back in.
    def fused(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec
            if w.collect { case pr: ProjectExec => pr }.nonEmpty => w
      }.nonEmpty
    val d = spark.range(100).select(col("id"),
      concat_ws(" ", lit("a"), lit("b"), lit("c"), col("id").cast("string")).as("text"))
    val sets = ShingleHashes.shingleHashes(col("text"), 2)
    val sigs = d.select(
      MinHashSig.minHashSig(sets, 8).as("sig"),
      MinHashBands.minHashBands(sets, 8, 4).as("bands"),
      SimHashSig.simHashSig(sets).as("sh"))
    assert(fused(sigs), sigs.queryExecution.executedPlan.toString)
    val planes = Seq.fill(8)(Seq.fill(4)(0.5))
    // plain array() — a transform(...) HOF here would itself be
    // CodegenFallback and mask what this test measures
    val vecs = spark.range(100).select(
      array((0 until 4).map(j => (col("id") + j).cast("double")): _*).as("v"))
    val keys = vecs.select(SrpBuckets.srpBuckets(col("v"), planes, 8).as("bks"))
    assert(fused(keys), keys.queryExecution.executedPlan.toString)
    // and the generated path computes the same values as the interpreted
    // kernel (collect() here exercises codegen; the DedupSpec pins cover
    // interpreted-vs-declarative)
    val viaCodegen = sigs.collect()
    assert(viaCodegen.length == 100 && viaCodegen.forall(r => !r.isNullAt(0)))
  }

  test("text kernels stay inside WholeStageCodegen (no CodegenFallback)") {
    import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
    import org.apache.spark.sql.functions._
    import graft.plans.{LangId, TextStats, Winnow}
    def fused(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec
            if w.collect { case pr: ProjectExec => pr }.nonEmpty => w
      }.nonEmpty
    val d = spark.range(100).select(col("id"),
      concat_ws(" ", lit("the quick brown fox and"), col("id").cast("string")).as("text"))
    val feats = d.select(
      LangId(col("text")).as("lang"),
      Winnow(col("text"), 2, 3).as("fp"),
      TextStats(col("text")).as("stats"))
    assert(fused(feats), feats.queryExecution.executedPlan.toString)
    // the generated path computes the same values as the interpreted path
    // (TextAnalysisSpec pins interpreted == declarative)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.getString(0) == "en"), rows.take(3).mkString(","))
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("graft-table SQL scan: filters and projection reach the relation node") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("plan_gt").toString + "/t"
    graft.operators.GraftTable.create(
      (0L until 400L).map(k => (k, k * 2.0, s"u${k % 7}")).toDF("k", "v", "u")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
        .sortWithinPartitions("k"),
      p, zoneCols = Seq("k"))
    val df = spark.read.format("graft-table").option("path", p).load()
      .filter(org.apache.spark.sql.functions.col("k") >= 100L &&
        org.apache.spark.sql.functions.col("k") <= 150L)
      .select("k", "v")
    val s = plan(df)
    // Catalyst hands the relation its filters (PushedFilters) and the
    // 2-column projection (ReadSchema) — the manifest pruning path
    assert(s.contains("PushedFilters") &&
      s.contains("GreaterThanOrEqual(k,100)") &&
      s.contains("LessThanOrEqual(k,150)"), s)
    assert(s.contains("ReadSchema") && !s.contains("u#"), s)
  }

  test("SQL-catalog dimension reports statistics and auto-broadcasts against a big fact") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_v2stats")
      .toString
    spark.conf.set("spark.sql.catalog.pstat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pstat.warehouse", wh)
    spark.sql("CREATE TABLE pstat.dim (k BIGINT, name STRING) " +
      "OPTIONS (zoneCols 'k')")
    (0L until 1000L).map(k => (k, s"name_$k")).toDF("k", "name")
      .createOrReplaceTempView("pstat_dim_src")
    spark.sql("INSERT INTO pstat.dim SELECT * FROM pstat_dim_src")
    // the V2 scan must report manifest-derived REAL bytes — without
    // SupportsReportStatistics the optimized plan carries
    // defaultSizeInBytes (≈ Long.Max) and never auto-broadcasts
    val dimOpt = spark.table("pstat.dim").queryExecution.optimizedPlan
    val dimStats = dimOpt.stats
    assert(dimStats.sizeInBytes > 0 &&
      dimStats.sizeInBytes < 10L * 1024 * 1024,
      s"the catalog scan must report a metadata-derived size: $dimStats\n" +
        s"plan: $dimOpt\nclass: ${dimOpt.getClass}")
    // an incompressible fact bigger than the broadcast threshold: only
    // the dimension side can broadcast
    (0L until 200000L).map(i => (i % 1000, i * 2654435761L))
      .toDF("k", "x").write.mode("overwrite").parquet(s"$wh/_fact")
    val fact = spark.read.parquet(s"$wh/_fact")
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "1MB")
    try {
      val joined = spark.sql(
        s"SELECT f.k, f.x, d.name FROM parquet.`$wh/_fact` f " +
          "JOIN pstat.dim d ON f.k = d.k")
      val p = plan(joined)
      assert(p.contains("BroadcastHashJoin"),
        s"a 1,000-row graft dimension must auto-broadcast through SQL " +
          s"text:\n$p")
      assert(joined.count() == 200000L)
      assert(fact.count() == 200000L)
    } finally spark.conf.set(conf, prev)
  }

  test("CBO column statistics: manifest-derived rowCount/min/max/NDV reach the optimized plan, opt-in only") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_cbostats")
      .toString
    spark.conf.set("spark.sql.catalog.pcbo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcbo.warehouse", wh)
    spark.sql("CREATE TABLE pcbo.t (k BIGINT, v DOUBLE, u STRING) " +
      "OPTIONS (zoneCols 'k')")
    (0L until 500L).map(k => (k, k * 2.0, s"u$k")).toDF("k", "v", "u")
      .createOrReplaceTempView("pcbo_src")
    spark.sql("INSERT INTO pcbo.t SELECT * FROM pcbo_src")
    def planStats = spark.table("pcbo.t")
      .queryExecution.optimizedPlan.stats
    // CBO off (the default): size-only statistics, no manifest fold
    assert(planStats.rowCount.isEmpty && planStats.attributeStats.isEmpty,
      s"stats must stay size-only without CBO: $planStats")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = planStats
      assert(st.rowCount.contains(BigInt(500)),
        s"CBO stats must carry the manifest row count: $st")
      val kStat = st.attributeStats.find(_._1.name == "k").map(_._2)
        .getOrElse(fail(s"no column statistics for the zone column: $st"))
      assert(kStat.min.contains(0L) && kStat.max.contains(499L),
        s"zone min/max must fold into the column stats: $kStat")
      assert(kStat.distinctCount.contains(BigInt(500)),
        s"integral NDV = min(non-null rows, range width): $kStat")
      assert(kStat.nullCount.contains(BigInt(0)), s"$kStat")
      // …and the estimate is live: a selective filter's row estimate
      // shrinks instead of defaulting
      val f = spark.table("pcbo.t").filter($"k" < 50L)
        .queryExecution.optimizedPlan.stats
      assert(f.rowCount.exists(rc => rc > 0 && rc < 200),
        s"CBO must estimate the selective filter from min/max: $f")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
