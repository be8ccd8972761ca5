package graft.operators

import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash band-bucket index for continuously-ingesting dedup.
  *
  * [[Dedup.incrementalMinHashPairs]] re-shingles and re-buckets the WHOLE
  * corpus every batch, so per-batch cost grows with corpus size even
  * though the join itself never does. The production shape pays the
  * signature cost once: [[DedupIndex.build]] materializes the corpus's
  * band buckets `(doc_id, band, bh)` and hashed shingle sets
  * `(doc_id, hs)` as BUCKETED parquet tables (the write pre-pays the
  * exchange — [[graft.sources.Sinks.bucketed]]); [[MinHashIndex.probe]]
  * computes signatures for the incoming batch only (narrow kernel
  * projections) and joins it against the stored index, where the corpus
  * side is a bucketed scan with NO exchange and NO kernel re-evaluation;
  * [[MinHashIndex.append]] folds the batch's precomputed buckets + sets
  * into the tables for the next round.
  *
  * Per-batch cost is therefore O(|batch| signatures + matching bucket
  * groups + candidate verification) — the corpus contributes a columnar
  * scan, never recomputation, and at 100 TB the scan itself prunes to
  * the `(band, bh)` groups the batch actually hashes into once the join
  * goes through a runtime bloom/DPP filter or a storage index.
  *
  * Semantics match [[Dedup.incrementalMinHashPairs]] exactly (same LSH
  * geometry, same exact-Jaccard verification, ids must be disjoint):
  * every emitted pair touches ≥ 1 incoming document, including
  * incoming×incoming pairs.
  */
final class MinHashIndex private[operators] (
    spark: SparkSession,
    val bucketsTable: String,
    val setsTable: String,
    val shingleN: Int,
    val numHashes: Int,
    val bands: Int,
    val buckets: Int) extends Serializable {

  /** Candidate + verified pairs between `incoming` and the indexed corpus
    * (plus incoming×incoming), without touching corpus text: the corpus
    * participates only as bucketed scans of the two index tables.
    *
    * Two candidate joins instead of one union-then-join: unioning the
    * bucketed corpus scan with the batch frame would erase the scan's
    * hash-partitioning and force BOTH sides through an exchange, so the
    * corpus⋈batch join keeps the bucketed side exchange-free and the
    * (small) batch self-join runs separately.
    *
    * @return (i, j, jac) with i < j, exact Jaccard ≥ threshold
    */
  def probe(
      incoming: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val inSets = Dedup.hashedSets(
      incoming.select(col(idCol).cast("long").as(idCol), col(textCol)),
      idCol, textCol, shingleN)
    val inBuckets = Dedup.bandBuckets(inSets, numHashes, bands)
    val corpusBuckets = spark.table(bucketsTable)
    val crossCand = corpusBuckets.as("a")
      .join(inBuckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("i"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("j"))
    val selfCand = inBuckets.as("a")
      .join(inBuckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    val candidates = crossCand.unionByName(selfCand).distinct()
    // verification needs sets only for docs appearing in candidates: a
    // semi-join prunes the corpus scan (bucketed on doc_id) before the
    // union with the batch's in-memory sets
    val candIds = candidates
      .select(explode(array(col("i"), col("j"))).as("doc_id")).distinct()
    val neededCorpus = spark.table(setsTable).join(candIds, Seq("doc_id"), "left_semi")
    Dedup.verifyHashed(neededCorpus.unionByName(inSets), candidates, threshold)
  }

  /** Fold a batch into the index: compute its buckets + sets (narrow) and
    * append them to the two tables with the SAME bucket spec — parquet
    * datasource tables accept bucketed appends, each append adding one
    * file per populated bucket id. Run [[compact]]-style maintenance
    * (e.g. [[graft.sources.Sinks.compactParquet]] + rebuild) when the
    * accumulated file count starts to dominate scan setup. Caller
    * guarantees batch ids are not already indexed.
    */
  def append(incoming: DataFrame, idCol: String, textCol: String): Unit = {
    val inSets = Dedup.hashedSets(
      incoming.select(col(idCol).cast("long").as(idCol), col(textCol)),
      idCol, textCol, shingleN)
    Dedup.bandBuckets(inSets, numHashes, bands)
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "band", "bh")
      .saveAsTable(bucketsTable)
    inSets.write.mode(SaveMode.Append)
      .bucketBy(buckets, "doc_id")
      .saveAsTable(setsTable)
  }

  /** Indexed corpus size (bucketed scan + count, no signature work). */
  def indexedDocs(): Long =
    spark.table(setsTable).count()
}

object DedupIndex {

  /** Build the persistent index for `docs` at `path`, registering the two
    * bucketed tables as `<name>_buckets` / `<name>_sets`. One full
    * signature pass over the corpus — the LAST one it ever needs.
    *
    * `buckets` sizes the pre-paid exchange: at 100 TB pick it like a
    * shuffle partition count for the bucket tables' data volume (the
    * band-bucket table is ~`bands` longs/doc, the sets table
    * ~|shingles| longs/doc).
    */
  def build(
      docs: DataFrame, idCol: String, textCol: String,
      path: String, name: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      buckets: Int = 32): MinHashIndex = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    val sets = Dedup.hashedSets(
      docs.select(col(idCol).cast("long").as(idCol), col(textCol)),
      idCol, textCol, shingleN)
    Sinks.bucketed(Dedup.bandBuckets(sets, numHashes, bands),
      s"${name}_buckets", s"$path/buckets", buckets, Seq("band", "bh"))
    Sinks.bucketed(sets, s"${name}_sets", s"$path/sets",
      buckets, Seq("doc_id"))
    new MinHashIndex(spark, s"${name}_buckets", s"${name}_sets",
      shingleN, numHashes, bands, buckets)
  }

  /** Re-open an existing index (e.g. a new session over yesterday's
    * tables) — no data work, just the handle.
    */
  def open(
      spark: SparkSession, name: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      buckets: Int = 32): MinHashIndex =
    new MinHashIndex(spark, s"${name}_buckets", s"${name}_sets",
      shingleN, numHashes, bands, buckets)
}
