package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Row-indexing operators: assigning stable, contiguous global ids — the
  * "give every document a training-set offset" step that precedes sequence
  * packing and shard addressing.
  */
object Indexing {

  /** Contiguous global ids 0..n−1 in the total order of `sortCols`,
    * appended as `idCol`.
    *
    * The scale-correct two-pass pattern: `repartitionByRange` +
    * `sortWithinPartitions` establishes the global order across
    * partitions (one range-shuffle — NOT a single-partition global sort),
    * then `zipWithIndex` runs one tiny counting job (one long per
    * partition) and adds driver-computed partition offsets in a narrow
    * pass. Contrast the two tempting wrong answers: a
    * `row_number() OVER (ORDER BY …)` window collapses the corpus onto
    * one task, and `monotonically_increasing_id` is neither contiguous
    * nor order-correlated.
    *
    * Determinism: `sortCols` must be a unique key — ids among duplicate
    * sort keys follow partition-internal order, which is not stable
    * across runs.
    */
  def globalIds(df: DataFrame, sortCols: Seq[String], idCol: String = "gid"): DataFrame = {
    require(sortCols.nonEmpty, "globalIds needs at least one sort column")
    val sorted = df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Rendezvous (highest-random-weight) shard assignment: shard(key) =
    * argmax over s ∈ [0, nShards) of md5-weight(key:s), appended as
    * `shardCol`. The shard-addressing scheme with MINIMAL disruption:
    * growing n → n+1 moves a key ONLY if the new shard wins its argmax
    * (expected 1/(n+1) of keys) — no key ever migrates between existing
    * shards, which modulo addressing (`key % n`) cannot promise.
    *
    * Pure function of (key, nShards) via the same md5 weight as
    * [[graft.operators.Sampling.hashWeight]] — engine-reproducible and
    * SQL-oracle-checkable. NARROW: the argmax folds over a generated
    * shard array per row; no shuffle, no join, no RNG.
    */
  def rendezvousShard(
      df: DataFrame, keyCol: String, nShards: Int,
      shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val weighted = transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(
        conv(substring(md5(concat(col(keyCol).cast("string"), lit(":"),
          s.cast("string"))), 1, 8), 16, 10).cast("long").as("w"),
        s.as("s")))
    df.withColumn(shardCol, array_max(weighted).getField("s"))
  }
}
