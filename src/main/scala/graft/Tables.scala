package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixture tables
  * (see TESTDATA.md / FIXTURES.md). One parquet file per table under
  * `<sfDir>/<name>.parquet`.
  *
  * Columnar parquet + Catalyst means projection and predicates push down to
  * the scan for free — callers should select/filter on the returned frames
  * directly rather than caching wide frames.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (which
      // Spark's vectorized reader rejects — read nanos as long, truncate
      // to micros) and plain timestamp[us] (which infers as TIMESTAMP_NTZ
      // under Spark 4's inferTimestampNTZ). Normalize both to session-tz
      // TimestampType so every downstream query sees one ts type; the
      // session runs UTC, so the NTZ→LTZ cast is instant-preserving and
      // matches the DuckDB oracle's naive `epoch(ts)`.
      // The nanos conf must stay set for the session: it is consulted
      // again when the scan executes, not only at schema inference.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // instant-preserving ONLY in a UTC session — enforce the
          // invariant every entrypoint pins (Session/Bench/Verify +
          // build.sbt javaOptions) rather than silently shifting every
          // event by the local zone offset under a future entrypoint
          require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
            "events.ts is TIMESTAMP_NTZ on disk: the NTZ->LTZ cast is " +
              "only instant-preserving with spark.sql.session.timeZone=" +
              s"UTC, got '${spark.conf.get("spark.sql.session.timeZone")}'")
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(path)
  }

  /** Register every fixture table as a temp view so `spark.sql` works with
    * the same table names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
