package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — the data-skipping layer between partition
  * pruning and row-group statistics: a tiny parquet table holding
  * per-FILE (min, max, null-count) for chosen columns, consulted before
  * a scan so that only files whose value ranges can satisfy the
  * predicate are read at all.
  *
  * Why this exists at 100 TB: partition pruning skips directories, and
  * parquet row-group stats skip pages — but only AFTER the scheduler has
  * opened every footer and launched a task per split. With ~800k files
  * (100 TB at 128 MB), footer-open fan-out is itself the bottleneck for
  * selective queries. A zone map is one metadata row per file (the
  * manifest-file idea of the public table formats — Delta/Iceberg file
  * statistics), so a selective scan plans from a few-MB table instead of
  * the corpus, and the surviving file list goes straight into the
  * reader. The zone table is METADATA-scale by construction: |files|
  * rows regardless of data volume, the same budget a table format's
  * manifest spends.
  *
  * Correctness contract (the part that makes this safe to use blindly):
  *  - CONSERVATIVE: pruning only ever DROPS files whose [min,max]
  *    provably cannot intersect the predicate; [[scan]] re-applies the
  *    exact predicate to the rows it does read, so the result equals the
  *    unpruned scan even when zones are coarse.
  *  - STALENESS-PROOF: [[scan]] lists the data directory (the same
  *    driver-side listing any parquet read performs) and UNIONS files
  *    not yet indexed into the read, unpruned — a lagging index can
  *    never lose rows; files that vanished since indexing are dropped
  *    from the plan rather than failing the read.
  *  - DERIVABLE: the index is a pure function of the data files, so
  *    losing it costs one [[build]] re-scan, never data. [[scan]] falls
  *    back to the full unpruned scan when the index is absent.
  *
  * Null semantics: min/max aggregate over non-null values, so a file
  * whose column is entirely null carries null min/max and is pruned for
  * range predicates — correct, because a range predicate rejects nulls.
  * IS NULL predicates must not be routed through [[Range]] pruning (the
  * per-file `nulls_c` count is persisted for that audit, not consulted
  * by pruning).
  *
  * Maintenance cycle, matching the repo's persistent-index family:
  * [[build]] / [[append]] (new files only, idempotent — keyed on file
  * path) / [[retract]] (drop zone rows for vanished files) / [[rebuild]]
  * (fresh derivation). Zone rows for live files are immutable because
  * parquet files are immutable — there is no update path by design.
  */
object ZoneMap {

  /** A prunable predicate on an indexed column. [[Range]] prunes by
    * zone min/max; [[Point]] additionally consults the per-file bloom
    * filter when one was built — the complement that matters on
    * hash-scattered layouts, where every file spans the full value
    * range (min/max prunes nothing) but each file still CONTAINS only
    * its own keys (a bloom prunes almost everything).
    */
  sealed trait Pred { def col: String }

  /** Inclusive range predicate on an indexed column; `lo`/`hi` may be
    * null for a one-sided bound. Used both for pruning (against zone
    * min/max) and for the exact re-filter on read.
    */
  final case class Range(col: String, lo: Any = null, hi: Any = null)
      extends Pred {
    require(lo != null || hi != null, s"Range on $col needs at least one bound")
  }

  /** Equality predicate. Prunes by zone min/max (when the column is
    * zone-indexed) AND by the per-file bloom (when built) — both checks
    * are conservative, so they compose by AND. `IS NULL` is not a
    * [[Point]]: blooms and min/max both ignore nulls.
    */
  final case class Point(col: String, v: Any) extends Pred {
    require(v != null, s"Point on $col needs a non-null value")
  }

  private val FileCol = "file"

  /** Scheme-free canonical file path: `input_file_name()` yields
    * `file:///a/b.parquet` while Hadoop listings yield `file:/a/b.parquet`
    * — both normalize to `/a/b.parquet`, which local and HDFS readers
    * accept back.
    */
  private def canonical(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9]+:/+", "/")

  private def listDataFiles(spark: SparkSession, dataPath: String): Seq[String] = {
    val p = new Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
        !name.startsWith("."))
        out += f.getPath.toUri.getPath
    }
    out.result()
  }

  /** Bloom sizing: bits for `items` at false-positive rate `fpp`
    * (the standard m = −n·ln p / ln²2), floored at 64.
    */
  private def bloomBits(items: Long, fpp: Double): Long =
    math.max(64L, math.ceil(
      -items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  /** What a bloom hashes: the value's STRING form, canonicalized by the
    * engine cast at build and by `toString` at probe — identical for
    * the longs/ints/strings point lookups use, and immune to the
    * caller's literal type differing from the column type (hashing
    * native types would make `Point("k", 400)` miss a LongType column —
    * a silent FALSE NEGATIVE, the one failure mode a pruning index must
    * never have).
    */
  private def bloomKey(c: Column): Column = xxhash64(c.cast("string"))

  private def probeHash(v: Any): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(v.toString)),
      42L).eval(null).asInstanceOf[Long]

  private def bloomAgg(c: String, items: Long, bits: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.graft.ColumnBridge.expression(bloomKey(col(c))),
        org.apache.spark.sql.catalyst.expressions.Literal(items),
        org.apache.spark.sql.catalyst.expressions.Literal(bits))
        .toAggregateExpression())

  /** Zone rows for exactly `files`: one group per file out of a single
    * scan — `(file, cnt, min_c…, max_c…, nulls_c…[, bloom_c…])`. The
    * shuffle moves |files| tiny rows (a bloom adds its fixed bit array);
    * partial aggregation collapses everything map-side first. Blooms
    * hash via `xxhash64`, the same hash [[survives]] probes with; each
    * file's bloom is self-contained, so files indexed by different
    * calls never need matching sizes.
    */
  private def zoneRows(spark: SparkSession, files: Seq[String],
      cols: Seq[String], bloomCols: Seq[String],
      bloomItems: Long, bloomFpp: Double): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    } ++ bloomCols.map { c =>
      bloomAgg(c, bloomItems, bloomBits(bloomItems, bloomFpp)).as(s"bloom_$c")
    }
    spark.read.parquet(files: _*)
      .groupBy(canonical(input_file_name()).as(FileCol))
      .agg(count(lit(1)).as("cnt"), aggs: _*)
  }

  /** Derive the zone table for every data file currently under
    * `dataPath` and publish it at `indexPath` (overwrite — the index is
    * derivable metadata, and [[scan]] tolerates its absence, so the
    * crash window costs a re-run, not correctness).
    *
    * @return number of files indexed
    */
  def build(spark: SparkSession, dataPath: String, cols: Seq[String],
      indexPath: String, bloomCols: Seq[String] = Nil,
      bloomItems: Long = 1000000L, bloomFpp: Double = 0.03): Long = {
    require(cols.nonEmpty || bloomCols.nonEmpty,
      "ZoneMap.build needs at least one column")
    val files = listDataFiles(spark, dataPath)
    require(files.nonEmpty, s"no parquet files under $dataPath")
    zoneRows(spark, files, cols, bloomCols, bloomItems, bloomFpp)
      .repartition(1) // |files| metadata rows — one file keeps reads cheap
      .write.mode(SaveMode.Overwrite).parquet(indexPath)
    files.size.toLong
  }

  /** The persisted zone table, or None when absent/uncommitted. */
  def zones(spark: SparkSession, indexPath: String): Option[DataFrame] = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(indexPath, "_SUCCESS")))
      Some(spark.read.parquet(indexPath))
    else None
  }

  private def indexedCols(z: DataFrame): Seq[String] =
    z.schema.fieldNames.collect { case f if f.startsWith("min_") => f.drop(4) }.toSeq

  private def bloomedCols(z: DataFrame): Seq[String] =
    z.schema.fieldNames.collect { case f if f.startsWith("bloom_") => f.drop(6) }.toSeq

  /** Index files that appeared since the last build/append — the
    * incremental leg of the maintenance cycle. Keyed on the canonical
    * file path, so re-running after a partial ingest (or an at-least-
    * once redelivery of the same files) appends nothing twice; a zone
    * row, once written, is immutable because its file is.
    *
    * @return number of newly indexed files
    */
  def append(spark: SparkSession, dataPath: String, indexPath: String,
      bloomItems: Long = 1000000L, bloomFpp: Double = 0.03): Long = {
    val z = zones(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"no committed zone map at $indexPath - build first"))
    val have = z.select(FileCol).collect().map(_.getString(0)).toSet
    val fresh = listDataFiles(spark, dataPath).filterNot(have)
    if (fresh.isEmpty) return 0L
    zoneRows(spark, fresh, indexedCols(z), bloomedCols(z), bloomItems, bloomFpp)
      .repartition(1)
      .write.mode(SaveMode.Append).parquet(indexPath)
    fresh.size.toLong
  }

  /** Drop zone rows whose files no longer exist (after a compaction or
    * retention delete). Publishes a fresh single-file index; pure
    * metadata rewrite, no data scan.
    *
    * @return number of zone rows retracted
    */
  def retract(spark: SparkSession, dataPath: String, indexPath: String): Long = {
    val z = zones(spark, indexPath).getOrElse(return 0L)
    val live = listDataFiles(spark, dataPath).toSet
    val rows = z.collect()
    val (keep, drop) = rows.partition(r =>
      live(r.getString(r.fieldIndex(FileCol))))
    if (drop.isEmpty) return 0L
    val kept = spark.createDataFrame(
      spark.sparkContext.parallelize(keep.toSeq, 1), z.schema)
    kept.write.mode(SaveMode.Overwrite).parquet(indexPath)
    drop.length.toLong
  }

  /** Fresh derivation at a (possibly new) location — the rebuild leg. */
  def rebuild(spark: SparkSession, dataPath: String, cols: Seq[String],
      toPath: String, bloomCols: Seq[String] = Nil): Long =
    build(spark, dataPath, cols, toPath, bloomCols)

  /** How stale is the index: (files on disk but unindexed, zone rows
    * whose files vanished). (0, 0) means the index exactly covers the
    * data; a nonzero first component only costs [[scan]] pruning power,
    * never correctness.
    */
  def staleness(spark: SparkSession, dataPath: String,
      indexPath: String): (Long, Long) = {
    val disk = listDataFiles(spark, dataPath).toSet
    val idx = zones(spark, indexPath) match {
      case Some(z) => z.select(FileCol).collect().map(_.getString(0)).toSet
      case None => Set.empty[String]
    }
    ((disk diff idx).size.toLong, (idx diff disk).size.toLong)
  }

  /** Survivor test for one file's zone row against every predicate:
    * keep the file iff EACH check that exists for its column can
    * intersect — null min/max (all-null column in that file) fails
    * every range/point, correctly, because both reject nulls; a bloom
    * miss (no false negatives) proves the key absent. Every check is
    * conservative, so multiple checks on one column compose by AND.
    */
  private def survives(preds: Seq[Pred], zoned: Set[String],
      bloomed: Set[String]): Column =
    preds.map {
      case Range(c, lo0, hi0) =>
        require(zoned(c), s"column $c not zone-indexed " +
          s"(indexed: ${zoned.mkString(", ")})")
        val lo = if (lo0 == null) lit(true)
          else col(s"max_$c").isNotNull && col(s"max_$c") >= lit(lo0)
        val hi = if (hi0 == null) lit(true)
          else col(s"min_$c").isNotNull && col(s"min_$c") <= lit(hi0)
        lo && hi
      case Point(c, v) =>
        require(zoned(c) || bloomed(c), s"column $c neither zone- nor " +
          s"bloom-indexed (zones: ${zoned.mkString(", ")}; " +
          s"blooms: ${bloomed.mkString(", ")})")
        // the bloom half of a Point check runs driver-side over the
        // collected zone rows ([[prunedFiles]]) — might_contain demands
        // a constant bloom, and the rows are metadata we collect anyway
        if (zoned(c))
          col(s"max_$c").isNotNull && col(s"max_$c") >= lit(v) &&
            col(s"min_$c") <= lit(v)
        else lit(true)
    }.reduce(_ && _)

  /** The exact row-level predicate the preds describe — re-applied on
    * read so pruning coarseness can never change results.
    */
  def predicate(preds: Seq[Pred]): Column =
    preds.map {
      case Range(c, lo0, hi0) =>
        val lo = if (lo0 == null) lit(true) else col(c) >= lit(lo0)
        val hi = if (hi0 == null) lit(true) else col(c) <= lit(hi0)
        lo && hi
      case Point(c, v) => col(c) === lit(v)
    }.reduce(_ && _)

  /** File paths a pruned scan must read: indexed survivors that still
    * exist, plus every not-yet-indexed file (unpruned — staleness must
    * widen the read, never narrow it). None = no committed index, caller
    * should full-scan.
    */
  def prunedFiles(spark: SparkSession, dataPath: String, indexPath: String,
      preds: Seq[Pred]): Option[Seq[String]] =
    zones(spark, indexPath).map { z =>
      val bloomed = bloomedCols(z).toSet
      val bloomPts = preds.collect {
        case p: Point if bloomed(p.col) => (s"bloom_${p.col}", probeHash(p.v))
      }
      val zoneSurvivors = z
        .filter(survives(preds, indexedCols(z).toSet, bloomed))
        .select((FileCol +: bloomPts.map(_._1).distinct).map(col): _*)
        .collect()
      // bloom half of every Point check, driver-side on the metadata
      // rows: a null bloom (all-null column in that file) cannot
      // contain the key — prune; no false negatives otherwise
      val survivors = zoneSurvivors.filter { r =>
        bloomPts.forall { case (bc, h) =>
          val bytes = r.getAs[Array[Byte]](bc)
          bytes != null && org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .mightContainLong(h)
        }
      }.map(_.getString(0))
      val disk = listDataFiles(spark, dataPath)
      val idx = z.select(FileCol).collect().map(_.getString(0)).toSet
      val unindexed = disk.filterNot(idx)
      (survivors.filter(disk.toSet) ++ unindexed).toSeq
    }

  /** Continuous ingest with zone maintenance folded into the sink: each
    * micro-batch lands as fresh data files, then the unindexed-file diff
    * indexes exactly those files (first batch bootstraps via [[build]]).
    * The index may lag the sink arbitrarily — a crash between the data
    * write and the zone append, a redelivered batch, a maintenance pass
    * that never ran — and scans stay exact throughout, because
    * staleness only WIDENS the read; the next append heals the whole
    * backlog at once, since the diff sees every unindexed file, not
    * just its own batch's. This is the guard-free idempotence argument
    * of [[Sketches.hllSliceStream]] in file-key form: the zone row for
    * a file is a pure function of that immutable file, so re-running
    * maintenance can never write a second, different row for it.
    *
    * Scope of the claim: the INDEX stays exact over whatever data
    * landed. The data sink itself is at-least-once — a redelivered
    * batch re-lands its rows as fresh files (which the index then
    * indexes, correctly); route through a keyed upsert sink instead
    * when row-level exactly-once matters.
    */
  def ingestStream(df: DataFrame, cols: Seq[String], dataDir: String,
      indexPath: String, checkpointDir: String,
      bloomCols: Seq[String] = Nil): Unit =
    IndexStream.run(df, checkpointDir) { batch =>
      batch.write.mode(SaveMode.Append).parquet(dataDir)
      val spark = batch.sparkSession
      if (zones(spark, indexPath).isEmpty)
        build(spark, dataDir, cols, indexPath, bloomCols)
      else append(spark, dataDir, indexPath)
    }

  /** Zone-map-pruned scan of `dataPath` under `preds`: reads only the
    * surviving files and re-applies the exact predicate. Result is
    * row-identical to `spark.read.parquet(dataPath).filter(predicate)`
    * under ANY index state (fresh, stale, or missing) — the index only
    * changes how many files open.
    */
  def scan(spark: SparkSession, dataPath: String, indexPath: String,
      preds: Seq[Pred]): DataFrame = {
    require(preds.nonEmpty, "ZoneMap.scan needs at least one range")
    val full = spark.read.parquet(dataPath)
    prunedFiles(spark, dataPath, indexPath, preds) match {
      case None => full.filter(predicate(preds))
      case Some(Nil) => full.filter(lit(false)) // schema-only, zero splits read
      case Some(files) =>
        spark.read.schema(full.schema).parquet(files: _*)
          .filter(predicate(preds))
    }
  }
}
