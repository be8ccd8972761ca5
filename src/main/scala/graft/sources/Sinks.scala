package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink surface — the reference's only sink is an in-memory scalar +
  * stdout (`crawler.go:253`, `cmd/app/app.go:54`); a complete engine needs
  * durable, partition-aware writers.
  *
  * Scale notes baked into the helpers:
  *  - `partitionBy` on a low-cardinality column gives partition-pruned
  *    reads downstream (the write-side half of predicate pushdown).
  *  - `maxRecordsPerFile` bounds file sizes so a 1000-executor read gets
  *    balanced splits.
  *  - repartition before write controls file count — the classic
  *    small-files problem at scale is caused by writing from too many
  *    tasks.
  */
object Sinks {

  /** Columnar write, optionally hive-style partitioned. */
  def parquet(
      df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      maxRecordsPerFile: Long = 5000000L,
      outputFiles: Int = 0): Unit = {
    val sized = if (outputFiles > 0) df.repartition(outputFiles) else df
    val w = sized.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def orc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Force full materialization without retaining output — benchmarking
    * sink (Spark's built-in `noop` v2 source).
    */
  def blackhole(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  /** Bucketed external table: rows are hash-partitioned into `buckets`
    * files by `bucketCols` (and optionally sorted within each bucket) at
    * write time. Two tables bucketed the same way join WITHOUT a shuffle —
    * the write pre-pays the exchange once, which is the decisive trade at
    * 100 TB when a fact table is joined on the same key by many queries.
    */
  def bucketed(
      df: DataFrame, table: String, path: String,
      buckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  // Small-file compaction and Z-order clustered writes moved to the
  // maintenance-operator family — [[graft.operators.Compaction]]
  // (row- and byte-driven sizing, sorted rewrites, the needsCompaction
  // trigger) and [[graft.operators.Layout]] (n-column Morton relayout
  // with reusable global bucket stats) — where they share the zone-map
  // data-skipping story and its specs.

  /** Write with free metrics: attach an `Observation` so row count and
    * per-column null counts are collected DURING the write — no second
    * scan over the data, which at 100 TB is the difference between
    * "emit a manifest" and "double the job". Returns the metrics map.
    */
  def parquetWithMetrics(
      df: DataFrame, path: String,
      nullCountCols: Seq[String] = Nil): Map[String, Any] = {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      nullCountCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"n_null_$c"))
    df.observe(obs, aggs.head, aggs.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
    obs.get
  }
}
