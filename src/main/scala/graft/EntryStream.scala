package graft

import graft.operators.{AsOfJoin, Dedup, DedupIndex, Graph, Indexing, Ingest, Multimodal, Packing, Pq, RangeJoin, Resample, Sampling, Similarity, TextAnalysis}
import graft.sources.Crawl
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructField, StructType}

/** Query bodies: structured-streaming family.
  * Bodies are verbatim from the pre-split SparkEntry.scala — the
  * registry ([[SparkEntry.queries]]) is still the single source of truth
  * for which of these are wired to the driver.
  */
private[graft] object EntryStream {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Multiset equality in ONE action — the `a.exceptAll(b).isEmpty &&
    * b.exceptAll(a).isEmpty` contract the in-body checks state, computed
    * as one signed-count group-by so each side is evaluated once instead
    * of twice per direction (the checks sit on expensive frames: change
    * feeds, head snapshots).
    */
  private def sameMultiset(a: DataFrame, b: DataFrame): Boolean =
    a.withColumn("_s", lit(1L))
      .unionByName(b.withColumn("_s", lit(-1L)))
      .groupBy(a.columns.map(col): _*)
      .agg(sum("_s").as("_d"))
      .filter(col("_d") =!= 0)
      .isEmpty

  /** Continuous-ingest dedup THROUGH the persistent index: the documents
    * arrive as a file-source stream in three micro-batches; each batch is
    * probed against everything indexed before it (plus itself via the
    * probe's self-join) and then folded into the index for the batches
    * after it. Cumulative pairs are batch-boundary INVARIANT — each pair
    * is emitted exactly once, by whichever batch completes it — so the
    * oracle is the FULL corpus pair closure, the same SQL as
    * `dedup_minhash`, with no reference to how the stream was chopped.
    */
  def streamIndexDedup(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val base = Scratch.dir("graft_sid")
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
      s"$base/pairs", Scratch.ckptDir("sdedup_ck"), threshold = 0.8)
    s.read.parquet(s"$base/pairs").orderBy("i", "j")
  }

  /** Continuous-ingest ANN through the persistent IVF index: the
    * quantizer trains and freezes on the FIRST HALF of the embeddings
    * fixture ([[Similarity.IvfIndex.build]] + save), then the second half
    * arrives as a three-wave vector stream folded in by
    * [[Similarity.IvfIndex.appendStream]] (per-batch narrow assignment
    * against the broadcast centroids, bucket-aligned append, idempotent
    * under redelivery). Search at nprobe = nClusters over the final index
    * is exhaustive, so the oracle is the SAME brute-force top-k as
    * `ann_topk`/`ann_ivf` — arrival form cannot change the answers.
    */
  def streamAnn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val base = Scratch.dir("graft_sann")
    val n = emb.agg(max("vec_id")).head.getLong(0) + 1
    val half = n / 2
    val idx = Similarity.IvfIndex.build(s, emb.filter(col("vec_id") < half),
      "vec_id", "embedding", nClusters = 16)
    Similarity.IvfIndex.save(idx, "graft_q_sann", s"$base/idx")
    val opened = Similarity.IvfIndex.open(s, "graft_q_sann", s"$base/idx")
    val third = (n - half) / 3
    Seq((half, half + third), (half + third, half + 2 * third),
        (half + 2 * third, n + 1)).foreach { case (lo, hi) =>
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    opened.appendStream(
      s.readStream
        .schema(StructType(Seq(
          StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      "vec_id", "embedding", Scratch.ckptDir("sann_ck"))
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])].collect().toMap
    opened.search(qs, k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")
  }

  /** Continuous lexical-index ingest: build the BM25 index on a third of
    * the corpus, stream the rest in as a three-wave document stream
    * through `appendStream`, search — df/N/avgdl are all derived from
    * the maintained tables, so the result equals the batch scorer over
    * the whole corpus and the `text_bm25` oracle applies (arrival form
    * cannot change corpus statistics).
    */
  def streamBm25(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val base = Scratch.dir("graft_sbm25")
    val idx = graft.operators.Bm25Index.build(
      docs.filter(col("doc_id") < 170), "doc_id", "text",
      base + "/idx", "graft_q_sbm25", buckets = 8)
    Seq((170, 280), (280, 390), (390, 100000)).foreach { case (lo, hi) =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    idx.appendStream(
      s.readStream
        .schema(StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType))))
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      "doc_id", "text", Scratch.ckptDir("sbm25_ck"))
    idx.search(Seq("table", "scan", "join"), 15)
  }

  /** Continuously maintained aggregate: build on half the corpus, fold
    * the rest in as a three-wave document stream — each micro-batch is
    * one ledgered monoid merge, so arrival form cannot change exact
    * counts/sums/mins/maxes and the `q_incr_agg` oracle applies
    * verbatim (the stream_bm25 equivalence argument, applied to
    * aggregation state instead of retrieval statistics).
    */
  def streamIncrAgg(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val base = Scratch.dir("graft_smagg")
    val n = docs.agg(max("doc_id")).head.getLong(0)
    val m = graft.operators.MaterializedAgg.build(
      docs.filter(col("doc_id") * 2 <= n), Seq("lang", "source"),
      Seq("n_chars"), s"$base/agg")
    val rest = docs.filter(col("doc_id") * 2 > n)
    Seq(
      col("doc_id") * 3 <= 2 * n,
      col("doc_id") * 3 > 2 * n && col("doc_id") * 6 <= 5 * n,
      col("doc_id") * 6 > 5 * n).foreach { p =>
      rest.filter(p).coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    m.updateStream(
      s.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in"), Scratch.ckptDir("sincr_ck"))
    m.read().select(col("lang"), col("source"), col("n"),
        col("s_n_chars").as("s"), col("mn_n_chars").as("mn"),
        col("mx_n_chars").as("mx"))
      .orderBy("lang", "source")
  }

  /** Continuous distinct-count sketching: the event stream's per-type
    * user sketches appended per micro-batch as slice rows, rolled up to
    * estimates after the drain — lossless merge makes the result
    * arrival-form blind, and redelivered slice rows cannot move it
    * (pointwise-max union). Rows-only: register estimates have no SQL
    * oracle (the `q_hll` precedent); SketchesSpec pins streamed ==
    * batch and redelivery idempotence.
    */
  def streamHll(s: SparkSession, d: String): DataFrame = {
    val base = Scratch.dir("graft_shll")
    graft.operators.Sketches.hllSliceStream(
      EventStreams.readEvents(s, d).select(col("event_type"), col("user_id")),
      Seq("event_type"), "user_id", s"$base/slices", Scratch.ckptDir("shll_ck"))
    graft.operators.Sketches.hllRollup(
        s.read.parquet(s"$base/slices"), Seq("event_type"))
      .orderBy("event_type")
  }

  /** Continuous decontamination: the corpus arrives as a three-wave
    * document stream, each micro-batch screened against the persistent
    * benchmark index ([[graft.operators.ScreenIndex.probeStream]]) —
    * the index is static during the stream, so cumulative pairs are
    * arrival-form blind and the batch cross oracle applies verbatim.
    */
  def streamScreen(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val base = Scratch.dir("graft_sscreen")
    val idx = graft.operators.ScreenIndex.build(
      docs.filter(col("doc_id") >= 400), "doc_id", "text",
      s"$base/idx", "graft_q_sscreen", shingleN = 3, threshold = 0.8,
      buckets = 8)
    val corpus = docs.filter(col("doc_id") < 400)
    Seq(col("doc_id") < 150, col("doc_id") >= 150 && col("doc_id") < 300,
        col("doc_id") >= 300)
      .foreach(p => corpus.filter(p).coalesce(1)
        .write.mode("append").parquet(s"$base/in"))
    idx.probeStream(
      s.readStream
        .schema(StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType))))
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      "doc_id", "text", s"$base/pairs", Scratch.ckptDir("sidx_ck"))
    s.read.parquet(s"$base/pairs").distinct().orderBy("i", "j")
  }

  /** Continuous heavy hitters — the composition [[graft.operators.Sketches.mgRollup]]'s
    * doc prescribes for top-k ingest: MG merges by SUM, so replayed slice
    * rows would double-count, and the exactly-once machinery already
    * exists in [[graft.operators.MaterializedAgg]]'s batch ledger. Exact
    * (day, type, user) counts fold through `updateStream`; the MG
    * compression happens at READ (counts → mg_count slices → per-type
    * rollup → top-10). At full counter capacity the rollup is exact, so
    * the q_mg_topk oracle applies verbatim — arrival form cannot move
    * ledgered exact counts.
    */
  def streamMgTopk(s: SparkSession, d: String): DataFrame = {
    val base = Scratch.dir("graft_smg")
    def shape(df: DataFrame) = df.select(to_date(col("ts")).as("day"),
      col("event_type"), col("user_id"))
    val m = graft.operators.MaterializedAgg.build(
      shape(t(s, d, "events")).filter(lit(false)),
      Seq("day", "event_type", "user_id"), Seq.empty, s"$base/agg")
    m.updateStream(shape(EventStreams.readEvents(s, d)), Scratch.ckptDir("sagg_ck"))
    val slices = m.read().select(col("day"), col("event_type"),
      col("user_id"), col("n").as("mg_count"))
    val rolled = graft.operators.Sketches.mgRollup(
      slices, Seq("event_type"), "user_id", k = 4096)
    val w = Window.partitionBy("event_type")
      .orderBy(col("mg_count").desc, col("user_id"))
    rolled.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select(col("event_type"), col("rnk"), col("user_id"),
        col("mg_count").as("c"))
      .orderBy("event_type", "rnk")
  }

  /** Zone maps under continuous ingest: three user_id-disjoint event
    * waves drain through [[graft.operators.ZoneMap.ingestStream]] — each
    * micro-batch lands data files and the unindexed-file diff indexes
    * them (first batch bootstraps the index). The final pruned scan
    * equals the plain filter over everything that arrived (the oracle);
    * ZoneMapSpec's staleness argument covers every in-between state, so
    * the index lagging the sink is harmless by construction.
    */
  def streamZonemap(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val base = Scratch.dir("graft_szm")
    Seq(col("user_id") < 30, col("user_id") >= 30 && col("user_id") < 70,
        col("user_id") >= 70)
      .foreach(p => ev.filter(p).coalesce(1)
        .write.mode("append").parquet(s"$base/in"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType)))
    graft.operators.ZoneMap.ingestStream(
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in"),
      Seq("user_id"), s"$base/data", s"$base/zones", Scratch.ckptDir("szm_ck"))
    graft.operators.ZoneMap.scan(s, s"$base/data", s"$base/zones",
        Seq(graft.operators.ZoneMap.Range("user_id", 20L, 60L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** The unified table under continuous ingest: three user_id-disjoint
    * event waves drain through [[graft.operators.GraftTable.ingestStream]]
    * — the first micro-batch CREATES the table with its batch id seeded
    * into the ledger atomically, every later batch is a ledgered append,
    * so any redelivery (first batch included) no-ops and the table is
    * file-level exactly-once — the guarantee [[streamZonemap]]'s
    * raw-directory sink explicitly does NOT make. The final pruned scan
    * equals the plain filter over everything that arrived (the oracle).
    */
  def streamTable(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val base = Scratch.dir("graft_stbl")
    Seq(col("user_id") < 30, col("user_id") >= 30 && col("user_id") < 70,
        col("user_id") >= 70)
      .foreach(p => ev.filter(p).coalesce(1)
        .write.mode("append").parquet(s"$base/in"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType)))
    graft.operators.GraftTable.ingestStream(
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in"),
      s"$base/tbl", Seq("user_id"), Scratch.ckptDir("stbl_ck"))
    val tbl = graft.operators.GraftTable.open(s, s"$base/tbl")
    require(tbl.lastAppliedBatch() >= 2,
      s"three waves must ledger three batches: ${tbl.lastAppliedBatch()}")
    tbl.scan(Seq(graft.operators.ZoneMap.Range("user_id", 25L, 65L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** [[streamTable]]'s lifecycle through the DataStreamWriter front
    * door instead of the API harness:
    * `writeStream.format("graft-table")` ([[graft.sources
    * .GraftTableSink]]) — the first micro-batch CREATES the table with
    * its batch id seeded into the create commit, every later batch is a
    * ledgered transactional append, and the checkpoint lineage owns the
    * ledger from birth (required in-body: a manual unledgered append
    * REFUSES — the silent-batch-drop guard). Same waves, same final
    * pruned scan, same oracle as `stream_table`: the sink is a new door
    * into the same exactly-once machinery, not new semantics.
    */
  def streamTableSink(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val base = Scratch.dir("graft_stsink")
    Seq(col("user_id") < 30, col("user_id") >= 30 && col("user_id") < 70,
        col("user_id") >= 70)
      .foreach(p => ev.filter(p).coalesce(1)
        .write.mode("append").parquet(s"$base/in"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType)))
    val q = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in")
      .writeStream.format("graft-table")
      .option("path", s"$base/tbl").option("zoneCols", "user_id")
      .option("checkpointLocation", Scratch.ckptDir("ssink_ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tbl = graft.operators.GraftTable.open(s, s"$base/tbl")
    require(tbl.lastAppliedBatch() >= 2,
      s"three waves must ledger three batches: ${tbl.lastAppliedBatch()}")
    val refused =
      try { tbl.append(ev.limit(1)); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("stream-ledgered") }
    require(refused, "a sink-bootstrapped table must refuse manual " +
      "unledgered appends — the checkpoint owns the ledger")
    tbl.scan(Seq(graft.operators.ZoneMap.Range("user_id", 25L, 65L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** Continuous upsert (the CDC-apply shape) through
    * [[graft.operators.GraftTable.mergeStream]]: three pinned-order
    * waves — the even events, then value-bumped updates of the
    * multiples of 4 plus the ≡1 (mod 4) inserts, then a second bump of
    * the multiples of 8 plus the ≡3 (mod 4) inserts — fold in as
    * ledgered latest-wins merges, so the final table is every event
    * with a deterministic per-key CASE of bumps: exactly what the
    * oracle states. Redelivery of any wave (first included) would
    * no-op against the ledger; each version along the way is a
    * consistent snapshot.
    */
  def streamMerge(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val base = Scratch.dir("graft_smerge")
    val waves = Seq(
      ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 4 === 0)
        .withColumn("value", col("value") + 1000)
        .unionByName(ev.filter(col("event_id") % 4 === 1)),
      ev.filter(col("event_id") % 8 === 0)
        .withColumn("value", col("value") + 2000)
        .unionByName(ev.filter(col("event_id") % 4 === 3)))
    waves.zipWithIndex.foreach { case (w, i) =>
      w.coalesce(1).write.parquet(s"$base/in/w$i") }
    graft.operators.SeriesSearch.pinArrivalOrder(
      s, waves.indices.map(i => s"$base/in/w$i"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType)))
    graft.operators.GraftTable.mergeStream(
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in/w*"),
      s"$base/tbl", "event_id", Scratch.ckptDir("smrg_ck"))
    val tbl = graft.operators.GraftTable.open(s, s"$base/tbl")
    require(tbl.lastAppliedBatch() >= 2,
      s"three waves must ledger three merges: ${tbl.lastAppliedBatch()}")
    tbl.read()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** CDC apply with DELETES through
    * [[graft.operators.GraftTable.mergeStream]]: three pinned-order waves
    * — the even events; then the ≡0 (mod 4) bumped +1000 plus TOMBSTONES
    * of the ≡2 (mod 8); then the ≡0 (mod 8) re-bumped +2000 (latest
    * wins) plus tombstones of the ≡4 (mod 8), which w1 had just bumped
    * (delete-after-upsert). Deletes apply as deletes — the rows are GONE
    * from the table, never silently upserted — so the final state is
    * closed-form: evens minus the two tombstoned classes, multiples of 8
    * carrying +2000. Redelivery of any wave would no-op against the
    * ledger; each intermediate version is a consistent snapshot.
    */
  def streamMergeDelete(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val del = graft.operators.GraftTable.DeleteOp
    val base = Scratch.dir("graft_smdel")
    val waves = Seq(
      ev.filter(col("event_id") % 2 === 0).withColumn("op", lit("upsert")),
      ev.filter(col("event_id") % 4 === 0)
        .withColumn("value", col("value") + 1000)
        .withColumn("op", lit("upsert"))
        .unionByName(ev.filter(col("event_id") % 8 === 2)
          .withColumn("op", lit(del))),
      ev.filter(col("event_id") % 8 === 0)
        .withColumn("value", col("value") + 2000)
        .withColumn("op", lit("upsert"))
        .unionByName(ev.filter(col("event_id") % 8 === 4)
          .withColumn("op", lit(del))))
    waves.zipWithIndex.foreach { case (w, i) =>
      w.coalesce(1).write.parquet(s"$base/in/w$i") }
    graft.operators.SeriesSearch.pinArrivalOrder(
      s, waves.indices.map(i => s"$base/in/w$i"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType),
      StructField("op", StringType)))
    graft.operators.GraftTable.mergeStream(
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in/w*"),
      s"$base/tbl", "event_id", Scratch.ckptDir("smrgd_ck"), opCol = "op")
    val tbl = graft.operators.GraftTable.open(s, s"$base/tbl")
    require(tbl.lastAppliedBatch() >= 2,
      s"three waves must ledger three merges: ${tbl.lastAppliedBatch()}")
    require(tbl.read().filter(col("event_id") % 8 === 2 ||
      col("event_id") % 8 === 4).count() == 0,
      "tombstoned keys must be GONE, not upserted")
    tbl.read()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** The change feed consumed as a stream
    * ([[graft.operators.GraftTable.drainChanges]], the Delta/Iceberg CDF
    * shape over the per-version manifests): a base snapshot of the
    * evens, then three commits — a CDC merge (bump ≡0 mod 8, delete
    * ≡2 mod 8), an append of the odd multiples of 3, and a second merge
    * (re-bump ≡0 mod 16 latest-wins, delete ≡4 mod 8) — each drained
    * through the durable cursor exactly once. The consumed feed, folded
    * per key (earliest delete = the pre-image, latest insert = the
    * post-image, a first-touch insert means the key post-dates the
    * base), must equal `Ingest.diff(base, head)` — required in-body —
    * and the non-unchanged fold is closed-form over the fixture, which
    * is what the oracle states.
    */
  def streamTableCdf(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val del = graft.operators.GraftTable.DeleteOp
    val base = Scratch.dir("graft_cdfq")
    val tbl = graft.operators.GraftTable.create(
      ev.filter(col("event_id") % 2 === 0)
        .repartitionByRange(8, col("event_id"))
        .sortWithinPartitions("event_id"),
      s"$base/tbl", zoneCols = Seq("event_id"), keepVersions = 4)
    val v1 = tbl.version
    val consumed = s"$base/consumed"
    def drain(): Long = tbl.drainChanges(s"$base/cursor", startAfter = v1) {
      (changes, _) => changes.write.mode("append").parquet(consumed)
    }
    require(drain() == 0L, "nothing to consume before the first commit")
    tbl.merge(
      ev.filter(col("event_id") % 8 === 0)
        .withColumn("value", col("value") + 1000)
        .withColumn("op", lit("upsert"))
        .unionByName(ev.filter(col("event_id") % 8 === 2)
          .withColumn("op", lit(del))),
      "event_id", "op")
    require(drain() == 1L, "one commit, one feed slice")
    tbl.append(ev.filter(col("event_id") % 2 === 1 && col("event_id") % 3 === 0))
    require(drain() == 1L, "appends feed too")
    tbl.merge(
      ev.filter(col("event_id") % 16 === 0)
        .withColumn("value", col("value") + 2000)
        .withColumn("op", lit("upsert"))
        .unionByName(ev.filter(col("event_id") % 8 === 4)
          .withColumn("op", lit(del))),
      "event_id", "op")
    require(drain() == 1L && drain() == 0L,
      "each commit is consumed exactly once — the cursor never re-drains")

    val feed = s.read.parquet(consumed)
    val img = struct(col("user_id"), col("event_type"), col("value"))
    // the r14 persisted slices speak Delta's four-type vocabulary:
    // update_postimage folds with insert, update_preimage with delete
    // (file-diff legs — appends — still emit plain insert/delete)
    val ins = feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .groupBy("event_id")
      .agg(max_by(img, col("_commit_version")).as("post"),
        max("_commit_version").as("vi"), min("_commit_version").as("viMin"))
    val dels = feed
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .groupBy("event_id")
      .agg(min_by(img, col("_commit_version")).as("pre"),
        min("_commit_version").as("vdMin"), max("_commit_version").as("vdMax"))
    // persisted: the fold feeds BOTH the in-body equality check and the
    // returned frame — one evaluation of the feed join instead of two
    // (the harness clears caches after consuming each query)
    val folded = ins.join(dels, Seq("event_id"), "full_outer")
      .withColumn("status",
        when(col("vi").isNull || col("vdMax") > col("vi"), lit("removed"))
          .when(col("vdMin").isNull || col("viMin") < col("vdMin"), lit("added"))
          .when(col("pre") <=> col("post"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("status") =!= "unchanged")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the feed IS the diff: fold == Ingest.diff(base snapshot, head)
    val want = graft.operators.Ingest
      .diff(tbl.readVersion(v1), tbl.read(), Seq("event_id"))
      .filter(col("status") =!= "unchanged")
    val got = folded.select("event_id", "status")
    require(sameMultiset(got, want),
      "the folded change feed must equal the head-minus-base diff")
    folded
      .withColumn("val", when(col("status") === "removed", col("pre.value"))
        .otherwise(col("post.value")))
      .withColumn("etype",
        when(col("status") === "removed", col("pre.event_type"))
          .otherwise(col("post.event_type")))
      .groupBy(col("status"), col("etype").as("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("v"))
      .orderBy("status", "event_type")
  }

  /** The change feed as a first-class Structured Streaming SOURCE
    * ([[graft.streaming.TableChangesSource]], `readStream
    * .format("graft-table-changes")`): a base snapshot of the evens,
    * then three commits — a CDC merge (bump ≡0 mod 8 +1000, delete ≡2
    * mod 8), an append of the odd multiples of 3, and a COMPACTION —
    * drained by an available-now run at `maxVersionsPerTrigger = 1`:
    * exactly three micro-batches, one per commit, the relayout's EMPTY
    * (required in-body). A second merge (re-bump ≡0 mod 16 latest-wins
    * over the +1000, delete ≡4 mod 8) lands AFTER the stream stopped; a
    * restart from the same checkpoint delivers exactly that one commit
    * and nothing already consumed, and a third run delivers nothing at
    * all (also required in-body) — the engine's offset WAL carrying the
    * cursor [[graft.operators.GraftTable.drainChanges]] tracks by hand.
    * Each slice is deterministic set algebra over the fixture, so the
    * oracle replays every (commit, change_type) group closed-form; the
    * absent compaction group is pinned by its absence from BOTH sides.
    */
  def streamTableChanges(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val del = graft.operators.GraftTable.DeleteOp
    val base = Scratch.dir("graft_cfsrc")
    val tbl = graft.operators.GraftTable.create(
      ev.filter(col("event_id") % 2 === 0)
        .repartitionByRange(8, col("event_id"))
        .sortWithinPartitions("event_id"),
      s"$base/tbl", zoneCols = Seq("event_id"), keepVersions = 6)
    val v1 = tbl.version
    tbl.merge(
      ev.filter(col("event_id") % 8 === 0)
        .withColumn("value", col("value") + 1000).withColumn("op", lit("u"))
        .unionByName(ev.filter(col("event_id") % 8 === 2)
          .withColumn("op", lit(del))),
      "event_id", "op")
    tbl.append(
      ev.filter(col("event_id") % 2 === 1 && col("event_id") % 3 === 0))
    tbl.compact(targetRows = 1000000)

    val out = s"$base/consumed"
    // ONE checkpoint dir shared by all three run() invocations — the
    // restart-from-checkpoint semantics under test depend on it
    val ckpt = Scratch.ckptDir("scfsrc_ck")
    val sizes = scala.collection.concurrent.TrieMap[Long, Long]()
    def run(): Unit = {
      val q = s.readStream.format("graft-table-changes")
        .option("path", s"$base/tbl")
        .option("startingVersion", v1)
        .option("maxVersionsPerTrigger", 1)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          val rows = b.count()
          sizes.put(id, rows)
          if (rows > 0) b.write.mode("append").parquet(out)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    run()
    require(sizes.size == 3,
      s"three commits, one micro-batch each at maxVersionsPerTrigger=1: $sizes")
    require(sizes.filter(_._2 == 0).keySet == Set(2L),
      s"the relayout (and ONLY it) must stream an empty batch: $sizes")
    tbl.merge(
      ev.filter(col("event_id") % 16 === 0)
        .withColumn("value", col("value") + 2000).withColumn("op", lit("u"))
        .unionByName(ev.filter(col("event_id") % 8 === 4)
          .withColumn("op", lit(del))),
      "event_id", "op")
    sizes.clear()
    run()
    require(sizes.keySet == Set(3L) && sizes(3L) > 0,
      s"a restart from the checkpoint delivers ONLY the new commit: $sizes")
    sizes.clear()
    run()
    require(sizes.isEmpty,
      s"a consumed commit never redelivers across restarts: $sizes")

    val feed = s.read.parquet(out)
    require(feed.filter(col("_commit_version") === v1 + 3).count() == 0,
      "the compaction version must be absent from the consumed feed")
    feed.withColumn("commit_seq", col("_commit_version") - v1)
      .groupBy(col("commit_seq"), col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("commit_seq", "change_type")
  }

  /** TABLE-TO-TABLE CDC REPLICATION through the streaming change-feed
    * source — the classic composition the source exists for: a replica
    * bootstraps from the source's base snapshot, then one AvailableNow
    * run of `format("graft-table-changes")` at `maxVersionsPerTrigger=1`
    * folds each commit's row-level slice into the replica as a CDC merge
    * (post-images upsert, tombstones delete, pre-images drop — and the
    * source's COMPACTION replicates as nothing, because its slice is
    * empty). The replica must equal the source head row-for-row
    * (required in-body via exceptAll both ways), so the oracle is the
    * source head's closed form.
    */
  def streamTableReplicate(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value")
    val del = graft.operators.GraftTable.DeleteOp
    val base = Scratch.dir("graft_repl")
    val evens = ev.filter(col("event_id") % 2 === 0)
      .repartitionByRange(8, col("event_id"))
      .sortWithinPartitions("event_id")
    val src = graft.operators.GraftTable.create(evens, s"$base/src",
      zoneCols = Seq("event_id"), keepVersions = 6)
    val v1 = src.version
    val replica = graft.operators.GraftTable.create(evens, s"$base/dst",
      zoneCols = Seq("event_id"))
    src.merge(
      ev.filter(col("event_id") % 8 === 0)
        .withColumn("value", col("value") + 1000).withColumn("op", lit("u"))
        .unionByName(ev.filter(col("event_id") % 8 === 2)
          .withColumn("op", lit(del))),
      "event_id", "op")
    src.append(
      ev.filter(col("event_id") % 2 === 1 && col("event_id") % 3 === 0))
    src.compact(targetRows = 1000000)

    val q = s.readStream.format("graft-table-changes")
      .option("path", s"$base/src")
      .option("startingVersion", v1)
      .option("maxVersionsPerTrigger", 1)
      .load()
      .writeStream
      .option("checkpointLocation", Scratch.ckptDir("srepl_ck"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        val cdc = b.filter(col("_change_type") =!= "update_preimage")
          .withColumn("op",
            when(col("_change_type") === "delete", lit(del))
              .otherwise(lit("u")))
          .drop("_change_type", "_commit_version")
        if (!cdc.isEmpty) { replica.merge(cdc, "event_id", "op"); () }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()

    // replica head persisted: it feeds the in-body equality check AND
    // the returned aggregate — one read instead of two (caches are
    // cleared by the harness after each query)
    val (srcHead, dstHead) = (src.read(),
      replica.read().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    require(sameMultiset(srcHead, dstHead),
      "the replica must equal the source head row-for-row")
    dstHead.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
  }

  /** Continuous subsequence matching: the event stream's per-user value
    * points drained through `SeriesSearch.scanStream` in time-ordered
    * waves, then the 15 nearest windows read from the cumulative scored
    * output — batch-boundary invariance makes the result identical to
    * the batch scan, so the `q_series_topk` oracle applies verbatim.
    * Waves split on event TIME (each wave is one file), honouring the
    * operator's per-key order contract.
    */
  def streamSeries(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val base = Scratch.dir("graft_sseries")
    // event_id is assigned in ts order by the fixture generator, so
    // event-id thirds are time-ordered waves (the per-key order contract)
    val n = ev.agg(max("event_id")).head.getLong(0)
    Seq(
      col("event_id") <= n / 3,
      col("event_id") > n / 3 && col("event_id") <= 2 * n / 3,
      col("event_id") > 2 * n / 3).zipWithIndex.foreach { case (p, i) =>
      ev.filter(p).coalesce(1).write.parquet(s"$base/in/w$i")
    }
    // FileStreamSource orders files by mtime, not name: pin strictly
    // increasing wave timestamps so same-tick writes can't arrive swapped
    graft.operators.SeriesSearch.pinArrivalOrder(
      s, (0 to 2).map(i => s"$base/in/w$i"))
    // the query pattern: user 0's first 8 values, as in q_series_topk
    val q = graft.operators.SeriesSearch.seriesOf(
        ev, "user_id", Seq("ts", "event_id"), "value")
      .filter(col("user_id") === 0)
      .head().getSeq[Double](1).take(8).toArray
    graft.operators.SeriesSearch.scanStream(
      s.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in/w*"),
      "user_id", Seq("ts", "event_id"), "value", q,
      s"$base/out", s"$base/state", Scratch.ckptDir("sser_ck"))
    s.read.parquet(s"$base/out")
      .distinct() // at-least-once redelivery re-appends identical rows
      .select(col("user_id"), col("off"), round(col("dist"), 6).as("dist"))
      .orderBy(col("dist"), col("user_id"), col("off"))
      .limit(15)
  }

  /** Tumbling-window streaming aggregation run to completion over the
    * bounded events fixture (complete output mode ⇒ equals the batch
    * answer; the oracle is the batch SQL).
    */
  def streamTumbling(s: SparkSession, d: String): DataFrame = {
    val stream = EventStreams.readEvents(s, d)
    val agg = EventStreams.tumblingCounts(stream, "1 hour", "2 hours")
    EventStreams.runToMemory(s, agg, s"stream_tumbling_${System.nanoTime()}", "complete")
      .select(unix_timestamp(col("window.start")).as("h"), col("event_type"),
        col("n"), round(col("v"), 2).as("v"))
      .orderBy("h", "event_type")
  }

  def streamSliding(s: SparkSession, d: String): DataFrame = {
    val agg = EventStreams.slidingCounts(EventStreams.readEvents(s, d),
      "10 minutes", "5 minutes")
    EventStreams.runToMemory(s, agg, s"stream_sliding_${System.nanoTime()}", "complete")
      .groupBy(unix_timestamp(col("window.start")).as("ws"))
      .agg(sum("n").as("c"))
      .orderBy("ws")
  }

  def streamSession(s: SparkSession, d: String): DataFrame = {
    val agg = EventStreams.sessionCounts(EventStreams.readEvents(s, d), "30 minutes")
    EventStreams.runToMemory(s, agg, s"stream_session_${System.nanoTime()}", "complete")
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("ss"), col("n"))
      .orderBy("user_id", "ss")
  }

  /** Stateful streaming: per-user running totals via flatMapGroupsWithState
    * in update mode; the final state per user equals the batch aggregation.
    */
  def streamState(s: SparkSession, d: String): DataFrame = {
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
  def streamTws(s: SparkSession, d: String): DataFrame = {
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
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val joined = EventStreams.purchaseAfterClick(EventStreams.readEvents(s, d))
    EventStreams.runToMemory(s, joined, s"stream_join_${System.nanoTime()}", "append")
      .orderBy("purchase_id", "click_id")
  }

  /** Stream-stream LEFT OUTER interval join run to completion: clicks
    * with their following purchases, or NULL once the watermark proves no
    * match can arrive. Per the operator's bounded-drain contract, two
    * sentinel waves (one NULL-user click + purchase each, ts 1–2 days
    * past the corpus) advance BOTH branch watermarks — the type filters
    * are pushed below the watermark operator, so only rows a branch keeps
    * can move its watermark — flushing every pending null wing; the
    * second wave guarantees a batch after the watermark moved. Null keys
    * never equi-join, so the sentinels fabricate no pairs; the wave-1
    * click sentinel's own null-wing row is dropped by its negative id.
    * Oracle = the batch LEFT JOIN under the same interval condition.
    */
  def streamLeftJoin(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val base = Scratch.dir("graft_sljoin")
    import s.implicits._
    // one sentinel per branch-surviving type and wave, null join keys,
    // negative ids — the bounded-drain contract, owned by the helper
    val glob = EventStreams.drainWithSentinels(ev, s"$base/in", "ts", waves = 2) {
      (i, ts) =>
        Seq((-2L * i, ts, Option.empty[Long], "click"),
          (-2L * i - 1, ts, Option.empty[Long], "purchase"))
          .toDF("event_id", "ts", "user_id", "event_type")
    }
    val joined = EventStreams.purchaseAttribution(
      s.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
        .parquet(glob))
    EventStreams.runToMemory(s, joined,
        s"stream_left_join_${System.nanoTime()}", "append")
      .filter(col("click_id") >= 0) // drop the sentinel's own null wing
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Streaming dedup: drop duplicate (user_id, event_type) pairs, then a
    * complete-mode count per type — whichever physical row survives the
    * dedup, the count equals the batch COUNT(DISTINCT user_id).
    */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val deduped = EventStreams.dedupEvents(EventStreams.readEvents(s, d),
      keys = Seq("user_id", "event_type"))
    val agg = deduped.groupBy("event_type").agg(count(lit(1)).as("n"))
    EventStreams.runToMemory(s, agg, s"stream_dedup_${System.nanoTime()}", "complete")
      .orderBy("event_type")
  }

  /** Bounded-state streaming dedup: [[streamDedup]]'s question answered
    * by `dropDuplicatesWithinWatermark` — a horizon wider than the whole
    * bounded fixture makes the result equal exact dedup (the same batch
    * COUNT(DISTINCT) oracle), while the operator's state stays
    * watermark-evicted by construction (the eviction behavior itself is
    * StreamingSpec's bounded-state test; a bounded replay fixture cannot
    * distinguish eviction, only correctness).
    */
  def streamDedupWm(s: SparkSession, d: String): DataFrame = {
    val deduped = EventStreams.dedupEventsBounded(EventStreams.readEvents(s, d),
      watermark = "30 days", keys = Seq("user_id", "event_type"))
    EventStreams.runToMemory(s, deduped,
        s"stream_dedup_wm_${System.nanoTime()}", "append")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Stream-static broadcast join: the event stream enriched with a
    * batch user-segment dimension, then complete-mode counts per
    * (segment, type) — must equal the batch group-by. No state store,
    * no watermark: the lookup-table streaming pattern.
    */
  def streamStatic(s: SparkSession, d: String): DataFrame = {
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

  /** Timer-based streaming sessions (transformWithState, event-time
    * timers): the deterministic face — sessions closed by a LATER EVENT
    * of the key (≥ 30-min gap). Timer-closed sessions depend on the
    * final watermark and are certified in StreamingSpec instead.
    */
  def streamTimer(s: SparkSession, d: String): DataFrame = {
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
}
