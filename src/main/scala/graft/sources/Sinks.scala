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

  /** Z-order clustered write: interleave the bit patterns of two
    * normalized numeric columns into one Morton key, range-partition and
    * sort the data by it, and write — so rows close in EITHER dimension
    * land in the same files, and a point/range filter on either column
    * touches a small fraction of them (parquet row-group min/max stats
    * skip the rest at read time). The multi-dimensional data-skipping
    * layout for a 100 TB fact table queried by more than one key; a plain
    * sort clusters only its leading column.
    *
    * Normalization is fixed-bounds floor binning to `bits`-bit ranks
    * (clamped), interleaving is a closed-form bit fold — both narrow; the
    * only exchange is the range partition that the write needs anyway.
    */
  def zorderWrite(
      df: DataFrame, path: String,
      colA: String, loA: Double, hiA: Double,
      colB: String, loB: Double, hiB: Double,
      files: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    require(bits > 0 && bits <= 31, s"bits out of (0,31]: $bits")
    require(files > 0, s"files must be positive: $files")
    require(hiA > loA && hiB > loB, "empty normalization range")
    val max = (1L << bits) - 1
    def rank(c: String, lo: Double, hi: Double) =
      greatest(lit(0L), least(lit(max),
        floor((col(c).cast("double") - lo) / (hi - lo) * (max + 1))))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(rank(colA, loA, hiA).bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(rank(colB, loB, hiB).bitwiseAND(lit(1L << i)), i + 1))
    }
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

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
