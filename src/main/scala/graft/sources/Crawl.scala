package graft.sources

import graft.functions.MonoidAggregator
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Recursive file-crawl source + monoid collect — the Spark-native image of
  * the reference's whole pipeline (`Crawler.Collect`,
  * `internal/filecrawler/crawler.go:204-255`).
  *
  * Reference stages → Spark realization:
  *  - BFS directory listing (O1/O5, `pool.go:168-196` + `crawler.go:113-155`)
  *    → `recursiveFileLookup=true`; Spark's `InMemoryFileIndex` lists
  *    directories in parallel on the driver/cluster, so the per-level
  *    barrier of the reference is subsumed (and beaten) by built-in listing.
  *  - per-file JSON decode (O6, `crawler.go:158-201`) → the JSON datasource
  *    in PERMISSIVE mode; one JSON document per file, user-supplied schema.
  *  - partial fold + final combine (O3+O4) → [[MonoidAggregator]] running as
  *    partial/final `HashAggregateExec` phases.
  *  - first-error-wins accounting (O9, `crawler.go:258-274`): the reference
  *    substitutes the zero value for undecodable files and still returns a
  *    result alongside the first error (`crawler.go:253`). We mirror that:
  *    corrupt records become zero-valued rows in the fold, and
  *    [[CrawlResult]] carries the count of corrupt files plus the first
  *    corrupt file's name (deterministic: lexicographically smallest).
  *  - cooperative cancellation (O10) → Spark job groups
  *    ([[Crawl.cancellable]] / [[Crawl.cancel]]).
  *
  * Scale note: file *listing* is driver-parallelized and the decode is one
  * Spark task per file-split, so a 100 TB tree of JSON documents scans with
  * full cluster parallelism; `spark.sql.files.maxPartitionBytes` controls
  * split size exactly where the reference exposed `FileWorkers`.
  *
  * Pluggable filesystems (the reference's `FileSystem` interface,
  * `internal/fs/filesystem.go:19-41`): `root` is any Hadoop-compatible URI
  * (`file://`, `hdfs://`, `s3a://`, …) — Spark's FileSystem layer is the
  * production-grade image of that abstraction, no custom interface needed.
  */
object Crawl {

  private val CorruptCol = "_corrupt_record"

  /** Raw crawl: one row per JSON document under `root` (recursive), with
    * `source_file` and `_corrupt_record` bookkeeping columns appended.
    */
  def crawlRaw(spark: SparkSession, root: String, schema: StructType): DataFrame =
    crawlRaw(spark, root, schema, "json", Map.empty)

  /** Format-generic recursive crawl. Text-based formats (`json`, `csv`)
    * decode PERMISSIVE with per-record corrupt accounting, the reference's
    * zero-on-decode-failure contract (`crawler.go:179,196`); columnar
    * formats (`parquet`, `orc`) validate structurally at the footer, so a
    * readable file has no per-record corruption and the corrupt column is
    * constant null. Extra `options` pass through to the reader (csv
    * delimiter, header, …).
    */
  def crawlRaw(
      spark: SparkSession, root: String, schema: StructType,
      format: String, options: Map[String, String]): DataFrame = {
    val base = spark.read
      .option("recursiveFileLookup", "true")
      .options(options)
    val df = format match {
      case "json" =>
        base.schema(schema.add(CorruptCol, StringType))
          // One JSON document per file, possibly pretty-printed — the
          // reference's decode unit (`crawler.go:53-54`).
          .option("multiLine", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
          .json(root)
      case "csv" =>
        base.schema(schema.add(CorruptCol, StringType))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
          .csv(root)
      case "parquet" | "orc" =>
        base.schema(schema).format(format).load(root)
          .withColumn(CorruptCol, lit(null).cast(StringType))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported crawl format '$other' (json, csv, parquet, orc)")
    }
    df.withColumn("source_file", input_file_name())
  }

  private def typedFrom[T: Encoder](raw: DataFrame, schema: StructType): Dataset[T] =
    raw
      .na.fill(0).na.fill(0.0).na.fill("").na.fill(false)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .as[T]

  /** Typed crawl with the reference's zero-value substitution for corrupt
    * files (`crawler.go:179,196`): numeric/boolean fields null out on decode
    * failure and are re-zeroed so downstream folds see the monoid identity.
    */
  def crawl[T: Encoder](spark: SparkSession, root: String, schema: StructType): Dataset[T] =
    typedFrom[T](crawlRaw(spark, root, schema), schema)

  /** Typed format-generic crawl (see the `crawlRaw` overload). */
  def crawl[T: Encoder](
      spark: SparkSession, root: String, schema: StructType,
      format: String, options: Map[String, String] = Map.empty): Dataset[T] =
    typedFrom[T](crawlRaw(spark, root, schema, format, options), schema)

  /** Result-plus-error shape of the reference's `Collect`
    * (`crawler.go:253` returns both `finalResult` and the first error).
    */
  final case class CrawlResult[R](result: R, corruptFiles: Long, firstError: Option[String])

  /** End-to-end crawl + monoid aggregation — the `Crawler.Collect` analogue
    * (O7). One aggregation job over the documents; error accounting runs as
    * a second cheap metadata pass only over corrupt rows.
    */
  def collect[T: Encoder, R](
      spark: SparkSession,
      root: String,
      schema: StructType,
      agg: MonoidAggregator[T, R],
      format: String = "json",
      options: Map[String, String] = Map.empty): CrawlResult[R] = {
    // Cache the parsed relation: Spark refuses plans that reference only the
    // corrupt-record column of a raw JSON scan, and caching also makes the
    // error pass free of a second file read.
    val raw = crawlRaw(spark, root, schema, format, options).cache()
    try {
      val result = typedFrom[T](raw, schema).select(agg.column).head()
      val corrupt = raw
        .filter(col(CorruptCol).isNotNull)
        .select(min(col("source_file")).as("first"), count(lit(1)).as("n"))
        .head()
      val n = corrupt.getLong(1)
      CrawlResult(
        result,
        n,
        if (n > 0) Some(s"failed to decode: ${corrupt.getString(0)}") else None)
    } finally raw.unpersist()
  }

  /** Run `body` under a named job group so it can be cancelled cooperatively
    * from another thread — the `context.Context` analogue (O10,
    * `pool.go:77,86` ctx checks).
    */
  def cancellable[A](spark: SparkSession, group: String)(body: => A): A = {
    spark.sparkContext.setJobGroup(group, s"graft cancellable: $group", interruptOnCancel = true)
    try body
    finally spark.sparkContext.clearJobGroup()
  }

  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)
}
