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

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes`-sized files. The maintenance pass every
    * long-lived ingest needs — streaming/micro-batch writers and
    * over-parallel jobs leave thousands of KB-sized files whose
    * per-file open cost (and NameNode/liststatus pressure) dominates
    * reads long before data volume does.
    *
    * The file count is computed from the directory's actual on-disk
    * bytes, and the rewrite uses `coalesce` — a NARROW merge of read
    * partitions, no shuffle; the read itself already packs small files
    * into `spark.sql.files.maxPartitionBytes`-sized splits, so the job
    * is one scan + one write. (Use a partitioned rewrite via
    * [[parquet]] with `repartition` instead when the layout — not just
    * the file size — must change.)
    *
    * @return number of output files requested
    */
  def compactParquet(
      spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"target must be positive: $targetFileBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var total = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    val n = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }
}
