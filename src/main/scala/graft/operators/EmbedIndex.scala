package graft.operators

import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent SRP bucket index for continuously-ingesting EMBEDDING dedup —
  * the vector-space twin of [[MinHashIndex]].
  *
  * [[Dedup.embeddingPairs]] recomputes every corpus vector's SRP keys on
  * every call, so per-batch cost grows with corpus size even though the
  * bucket join itself never does. The production shape pays the key cost
  * once: [[EmbedIndex.build]] materializes the corpus's per-table bucket
  * keys `(vid, t, bk)` and the vectors `(vid, v)` as BUCKETED parquet
  * tables; [[SrpEmbedIndex.probe]] computes keys for the incoming batch
  * only (one narrow kernel projection) and joins against the stored
  * index, where the corpus side is a bucketed scan with NO exchange and
  * NO kernel re-evaluation; [[SrpEmbedIndex.append]] folds the batch in
  * for the rounds after it; [[SrpEmbedIndex.delete]]/[[SrpEmbedIndex.compact]]
  * are the same rewrite-as-maintenance shape as the minhash index.
  *
  * The LSH geometry (key width from [[Lsh.autoPlanes]] at build-time
  * corpus size, table count from [[Lsh.autoTables]] at the stated
  * threshold, hyperplanes regenerated from the seed) is persisted in a
  * one-row `meta` parquet, because unlike shingle hashing it is NOT
  * caller-reconstructible: the derived width depends on what the corpus
  * size WAS when the index was built. [[EmbedIndex.open]] reads it back —
  * opening never guesses geometry.
  *
  * Semantics match [[Dedup.embeddingPairs]] under the build-time geometry,
  * restricted to pairs touching ≥ 1 incoming vector (including
  * incoming×incoming): candidates from shared buckets in ≥ 1 table, then
  * EXACT cosine verification at the probe threshold. Ids must be disjoint
  * from the indexed ones.
  */
final class SrpEmbedIndex private[operators] (
    spark: SparkSession,
    val bucketsTable: String,
    val vectorsTable: String,
    val path: String,
    val dim: Int,
    val bits: Int,
    val tables: Int,
    val seed: Long,
    val buckets: Int) extends Serializable {

  /** The build-time hyperplanes, regenerated deterministically — SAME
    * construction as `Dedup.srpBucketed` (one Random stream, table-major),
    * so stored keys and probe keys come from identical planes.
    */
  private def planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables * bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** (vid, v, t, bk) bucket rows for a batch — the one narrow kernel pass
    * a probe or append pays.
    */
  private[operators] def batchBuckets(
      incoming: DataFrame, idCol: String, vecCol: String): DataFrame =
    incoming.select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"),
        graft.plans.SrpBuckets.srpBuckets(col(vecCol), planes, bits).as("bks"))
      .filter(col("bks").isNotNull)
      .select(col("vid"), col("v"), posexplode(col("bks")).as(Seq("t", "bk")))

  /** Verified near-duplicate pairs between `incoming` and the indexed
    * corpus (plus incoming×incoming), without touching corpus vectors
    * beyond bucketed scans. Two candidate joins instead of one
    * union-then-join, for the same reason as [[MinHashIndex.probe]]: a
    * union would erase the stored side's hash-partitioning and force the
    * corpus through an exchange.
    *
    * @return (i, j, cos) with i < j, exact cosine ≥ threshold
    */
  def probe(
      incoming: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95): DataFrame =
    probeTracked(incoming, idCol, vecCol, threshold)._1

  /** [[probe]] plus a cleanup thunk for the localCheckpointed
    * intermediates — same contract as [[MinHashIndex.probeTracked]]:
    * one-shot callers may ignore it, [[probeStream]] must not.
    */
  private[operators] def probeTracked(
      incoming: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95): (DataFrame, () => Unit) = {
    val sess = incoming.sparkSession
    sess.catalog.refreshTable(bucketsTable)
    sess.catalog.refreshTable(vectorsTable)
    val inB = batchBuckets(incoming, idCol, vecCol)
    val corpusBuckets = sess.table(bucketsTable)
    val crossCand = corpusBuckets.as("a")
      .join(inB.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.vid") =!= col("b.vid"))
      .select(least(col("a.vid"), col("b.vid")).as("i"),
        greatest(col("a.vid"), col("b.vid")).as("j"))
    val selfCand = inB.as("a")
      .join(inB.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("i"), col("b.vid").as("j"))
    // candidate-bounded frames consumed by multiple joins below — one
    // eager materialization each, dropped by the returned cleanup
    val candidates = crossCand.unionByName(selfCand).distinct()
      .localCheckpoint(true)
    val candIds = candidates
      .select(explode(array(col("i"), col("j"))).as("vid")).distinct()
    val neededCorpus = sess.table(vectorsTable)
      .join(candIds, Seq("vid"), "left_semi")
    val verifyVecs = neededCorpus
      .unionByName(inB.select(col("vid"), col("v")).dropDuplicates("vid"))
      .localCheckpoint(true)
    val pairs = candidates
      .join(verifyVecs.as("vi"), col("i") === col("vi.vid"))
      .join(verifyVecs.as("vj"), col("j") === col("vj.vid"))
      .select(col("i"), col("j"),
        graft.plans.GraftFunctions.cosine(col("vi.v"), col("vj.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 3).as("cos"))
    (pairs, () => { candidates.unpersist(); verifyVecs.unpersist(); () })
  }

  /** Fold a batch into the index: one kernel pass for its keys, bucketed
    * appends to both tables. Caller guarantees ids are not already
    * indexed.
    */
  def append(incoming: DataFrame, idCol: String, vecCol: String): Unit = {
    val inB = batchBuckets(incoming, idCol, vecCol)
    inB.select("vid", "t", "bk")
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "t", "bk")
      .saveAsTable(bucketsTable)
    inB.select(col("vid"), col("v")).dropDuplicates("vid")
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "vid")
      .saveAsTable(vectorsTable)
  }

  /** Indexed corpus size (bucketed scan + count, no kernel work). */
  def indexedVectors(): Long = {
    spark.catalog.refreshTable(vectorsTable)
    spark.table(vectorsTable).count()
  }

  /** Continuous-ingest embedding dedup: drive a STREAM of vectors through
    * the index — probe each micro-batch (cross-batch via the stored
    * index, same-batch via the self-join), append pairs to `pairsDir`,
    * fold the batch in. Cumulative output is batch-boundary INVARIANT,
    * exactly as documented on [[MinHashIndex.probeStream]], so the
    * streamed pairs equal the full-corpus [[Dedup.embeddingPairs]]
    * closure at this index's geometry.
    */
  def probeStream(
      incoming: DataFrame, idCol: String, vecCol: String,
      pairsDir: String, checkpointDir: String,
      threshold: Double = 0.95): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint(eager = true)
        val (pairs, cleanup) = probeTracked(b, idCol, vecCol, threshold)
        try {
          pairs.write.mode(SaveMode.Append).parquet(pairsDir)
          append(b, idCol, vecCol)
        } finally {
          cleanup()
          b.unpersist()
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** Remove vectors from the index (retraction / TTL expiry): anti-join
    * rewrite of both tables into `toPath`, same bucket spec — doubles as
    * a [[compact]]. Deleted ids never appear in subsequent probe output.
    */
  def delete(ids: DataFrame, idCol: String, toPath: String): SrpEmbedIndex = {
    val del = ids.select(col(idCol).cast("long").as("vid"))
    rewrite(toPath, _.join(del, Seq("vid"), "left_anti"))
  }

  /** Small-file maintenance: fold append-accumulated files into one file
    * per bucket, probes unchanged (the [[MinHashIndex.compact]] shape).
    */
  def compact(toPath: String): SrpEmbedIndex = rewrite(toPath, identity)

  private def rewrite(
      toPath: String, f: DataFrame => DataFrame): SrpEmbedIndex = {
    require(toPath != path, s"rewrite target must differ from current path: $path")
    // files, not the catalog table — the rewrite must not depend on the
    // table it is about to redefine
    Sinks.bucketed(
      f(spark.read.parquet(s"$path/buckets"))
        .repartition(buckets, col("t"), col("bk")),
      bucketsTable, s"$toPath/buckets", buckets, Seq("t", "bk"))
    Sinks.bucketed(
      f(spark.read.parquet(s"$path/vectors"))
        .repartition(buckets, col("vid")),
      vectorsTable, s"$toPath/vectors", buckets, Seq("vid"))
    EmbedIndex.writeMeta(spark, toPath, dim, bits, tables, seed, buckets)
    new SrpEmbedIndex(spark, bucketsTable, vectorsTable, toPath,
      dim, bits, tables, seed, buckets)
  }
}

object EmbedIndex {

  /** Build the persistent index for `emb` at `path`, registering
    * `<name>_ebuckets` / `<name>_evectors`. One full key pass over the
    * corpus — the last one it ever needs. Geometry: width from
    * [[Lsh.autoPlanes]] on the corpus count (unless pinned), tables from
    * [[Lsh.autoTables]] at `threshold` (the recall design point baked
    * into the index), both persisted to `meta`.
    */
  def build(
      emb: DataFrame, idCol: String, vecCol: String,
      path: String, name: String, dim: Int,
      threshold: Double = 0.95, planesPerTable: Int = 0, tables: Int = 0,
      seed: Long = 42L, buckets: Int = 32): SrpEmbedIndex = {
    val spark = emb.sparkSession
    val bits =
      if (planesPerTable > 0) planesPerTable else Lsh.autoPlanes(emb.count())
    val nTables = if (tables > 0) tables else Lsh.autoTables(bits, threshold)
    writeMeta(spark, path, dim, bits, nTables, seed, buckets)
    val idx = new SrpEmbedIndex(spark, s"${name}_ebuckets", s"${name}_evectors",
      path, dim, bits, nTables, seed, buckets)
    val all = idx.batchBuckets(emb, idCol, vecCol)
    Sinks.bucketed(all.select("vid", "t", "bk"),
      s"${name}_ebuckets", s"$path/buckets", buckets, Seq("t", "bk"))
    Sinks.bucketed(all.select(col("vid"), col("v")).dropDuplicates("vid"),
      s"${name}_evectors", s"$path/vectors", buckets, Seq("vid"))
    idx
  }

  /** Re-open an existing index: geometry loads from `meta` (never guessed
    * — the derived key width depends on the corpus size at build time).
    */
  def open(spark: SparkSession, name: String, path: String): SrpEmbedIndex = {
    val m = spark.read.parquet(s"$path/meta").head()
    new SrpEmbedIndex(spark, s"${name}_ebuckets", s"${name}_evectors", path,
      m.getAs[Int]("dim"), m.getAs[Int]("bits"), m.getAs[Int]("tables"),
      m.getAs[Long]("seed"), m.getAs[Int]("buckets"))
  }

  private[operators] def writeMeta(
      spark: SparkSession, path: String, dim: Int, bits: Int,
      tables: Int, seed: Long, buckets: Int): Unit = {
    import spark.implicits._
    Seq((dim, bits, tables, seed, buckets))
      .toDF("dim", "bits", "tables", "seed", "buckets")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }
}
