package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate table — the reference's monoid
  * contract (`crawler.go:31-32`: partial fold + associative combine)
  * applied to TABLE maintenance instead of a one-shot query. A dashboard
  * aggregate over an append-only 100 TB corpus must never re-scan the
  * corpus to refresh: each arriving batch folds in as ONE batch-sized
  * partial aggregate merged with the stored state (count/sum/min/max are
  * monoids; avg derives as sum/count at read), so per-update cost is
  * batch-partial + a state-sized merge — independent of corpus history.
  *
  * Exactly-once folding over at-least-once delivery: unlike the
  * append-family indexes (where a key anti-join makes redelivery benign),
  * re-folding a batch into a SUM double-counts — there is no key to
  * guard on. The ledger is the guard: every committed version carries the
  * applied batch-id set in its meta, and [[MatAgg.update]] no-ops on an
  * already-applied id. State publishes as `v{n}/state` + `v{n}/meta`
  * version directories, meta written LAST and gated on its `_SUCCESS`
  * marker (the [[ComponentsIndex]] remap-v{n} discipline): a crash
  * mid-update leaves an uncommitted partial the redelivered batch
  * overwrites, never a state/ledger mismatch — the two commit atomically
  * because the ledger lives inside the version it describes.
  *
  * Determinism contract: counts, and sums over integral columns, are
  * exact — incremental == one-shot groupBy bit-for-bit at any batch
  * split (the declared oracle relies on this). Sums over doubles fold in
  * arrival order and carry the usual float-association caveat; min/max
  * are order-free for all types.
  */
object MaterializedAgg {

  /** Aggregate `df` by `groupCols` and publish version 1 at `path`:
    * per-group row count `n`, and per value column `c` its non-null
    * count `c_{c}`, sum `s_{c}`, min `mn_{c}`, max `mx_{c}`.
    */
  def build(df: DataFrame, groupCols: Seq[String], valCols: Seq[String],
      path: String): MatAgg = {
    require(groupCols.nonEmpty, "materialized aggregate needs group columns")
    val reserved = groupCols.toSet + "n"
    require(valCols.forall(c => !reserved.contains(c)),
      s"value columns $valCols collide with group columns or 'n'")
    val spark = df.sparkSession
    publish(spark, path, partial(df, groupCols, valCols), 1L,
      groupCols, valCols, Seq.empty)
    new MatAgg(spark, path, groupCols, valCols)
  }

  /** Reopen a maintained aggregate. Geometry (group/value columns) comes
    * from the stored meta — the family's meta-wins rule; `open` never
    * guesses what `build` was told.
    */
  def open(spark: SparkSession, path: String): MatAgg = {
    val v = currentVersion(spark, path).getOrElse(
      sys.error(s"no committed materialized-aggregate version under $path"))
    val m = spark.read.parquet(s"$path/v$v/meta").collect()
    require(m.length == 1, s"corrupt meta under $path/v$v: ${m.length} rows")
    new MatAgg(spark, path,
      m(0).getSeq[String](0), m(0).getSeq[String](1))
  }

  /** One map-side-combined hash aggregate over a frame — the monoid's
    * partial fold. Shared by build, update and the merge (merging two
    * partials re-applies the same shapes: sum of n, sum of s, min of mn,
    * max of mx), so the fold and the combine cannot drift.
    */
  private[graft] def partial(df: DataFrame, groupCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n") +: valCols.flatMap(c => Seq(
      count(col(c)).as(s"c_$c"), sum(col(c)).as(s"s_$c"),
      min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private[operators] def merge(state: DataFrame, p: DataFrame,
      groupCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val aggs = sum(col("n")).as("n") +: valCols.flatMap(c => Seq(
      sum(col(s"c_$c")).as(s"c_$c"), sum(col(s"s_$c")).as(s"s_$c"),
      min(col(s"mn_$c")).as(s"mn_$c"), max(col(s"mx_$c")).as(s"mx_$c")))
    state.unionByName(p).groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VerRe = "v(\\d+)".r

  /** Committed versions ascending — a version counts only once its
    * meta's `_SUCCESS` exists (meta is written last).
    */
  private def committedVersions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VerRe(n) if f.exists(new Path(st.getPath, "meta/_SUCCESS")) =>
          Some(n.toLong)
        case _ => None
      }).sorted
  }

  private[operators] def currentVersion(
      spark: SparkSession, base: String): Option[Long] =
    committedVersions(spark, base).lastOption

  /** Publish `state` as version `ver`: state first, meta (geometry +
    * applied-batch ledger) LAST so the `_SUCCESS`-gated meta commits the
    * version and its ledger atomically; then prune superseded versions,
    * marker-first, best-effort.
    */
  private def publish(spark: SparkSession, base: String, state: DataFrame,
      ver: Long, groupCols: Seq[String], valCols: Seq[String],
      applied: Seq[Long]): Unit = {
    import spark.implicits._
    // Overwrite clears any uncommitted partial a previous crash left here
    state.write.mode(SaveMode.Overwrite).parquet(s"$base/v$ver/state")
    Seq((groupCols, valCols, applied))
      .toDF("group_cols", "val_cols", "applied")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/v$ver/meta")
    val f = fs(spark, base)
    require(f.exists(new Path(s"$base/v$ver/meta/_SUCCESS")),
      s"parquet commit left no _SUCCESS under $base/v$ver/meta " +
        "(mapreduce.fileoutputcommitter.marksuccessfuljobs disabled?) — " +
        "versioned publication depends on the marker")
    committedVersions(spark, base).filter(_ < ver).foreach { v =>
      try {
        f.delete(new Path(s"$base/v$v/meta/_SUCCESS"), false)
        f.delete(new Path(s"$base/v$v"), true)
      } catch { case _: Throwable => () } // prune is best-effort cleanup
    }
  }

  /** A maintained aggregate at rest. Thread-compat: updates are
    * single-writer (one maintenance stream per table, the index-family
    * contract); reads are safe concurrently with updates because readers
    * resolve the highest COMMITTED version.
    */
  final class MatAgg private[MaterializedAgg] (spark: SparkSession,
      path: String, val groupCols: Seq[String], val valCols: Seq[String]) {

    private def cur: Long = currentVersion(spark, path).getOrElse(
      sys.error(s"no committed version under $path — concurrent prune?"))

    private def meta(v: Long): (Seq[String], Seq[String], Seq[Long]) = {
      val m = spark.read.parquet(s"$path/v$v/meta").collect()(0)
      (m.getSeq[String](0), m.getSeq[String](1), m.getSeq[Long](2))
    }

    /** Batch ids already folded in — the exactly-once ledger. */
    def appliedBatches(): Seq[Long] = meta(cur)._3

    /** Fold one batch in under `batchId`; an already-applied id no-ops
      * (WARNed) — at-least-once redelivery cannot double-count. Ids must
      * be unique per logical batch and stable under redelivery (a stream
      * checkpoint's micro-batch ids; resuming a table under a FRESH
      * checkpoint restarts ids at 0 and would collide — one checkpoint
      * lineage per table, like every index stream here).
      *
      * @return true if folded, false if skipped as already applied
      */
    def update(batch: DataFrame, batchId: Long): Boolean = {
      val v = cur
      val (_, _, applied) = meta(v)
      if (applied.contains(batchId)) {
        DedupIndex.log.warn(s"materialized aggregate $path: batch $batchId " +
          s"already applied (of ${applied.length}) — redelivery skipped")
        false
      } else {
        val merged = merge(spark.read.parquet(s"$path/v$v/state"),
          partial(batch, groupCols, valCols), groupCols, valCols)
        publish(spark, path, merged, v + 1, groupCols, valCols,
          applied :+ batchId)
        true
      }
    }

    /** Continuous maintenance: fold a STREAM of rows in, one ledgered
      * update per micro-batch through the shared [[IndexStream]] harness
      * — the micro-batch id IS the ledger id, so foreachBatch redelivery
      * hits the applied set and no-ops.
      */
    def updateStream(rows: DataFrame, checkpointDir: String): Unit =
      IndexStream.runIndexed(rows, checkpointDir)(
        (batch, id) => { update(batch, id); () })

    /** The served aggregate: stored state plus derived per-column
      * averages `avg_{c}` = `s_{c}` / `c_{c}` (null when no non-null
      * values) — derived at read, never stored, because avg is not a
      * monoid.
      */
    def read(): DataFrame = {
      val st = spark.read.parquet(s"$path/v$cur/state")
      valCols.foldLeft(st)((d, c) => d.withColumn(s"avg_$c",
        when(col(s"c_$c") > 0,
          col(s"s_$c").cast("double") / col(s"c_$c"))))
    }
  }
}
