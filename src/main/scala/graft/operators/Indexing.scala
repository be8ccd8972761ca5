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
}
