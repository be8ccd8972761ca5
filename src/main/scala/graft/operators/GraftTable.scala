package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The unified table: data files + zone statistics + layout committed as
  * ONE atomic version — the composition of [[Compaction]], [[Layout]]
  * and [[ZoneMap]] under a single manifest pointer, so a 100 TB table
  * owner never hand-choreographs "rewrite the files, then heal the
  * index" again (the one maintenance dance the standalone operators
  * still required, and the core idea of the public table formats:
  * Delta/Iceberg snapshot isolation, here in the repo's own
  * versioned-meta discipline, exactly [[MaterializedAgg]]'s publish).
  *
  * On-disk layout:
  * {{{
  *   base/data/g{v}/part-*.parquet   immutable data files, written once
  *                                   by the version-v publish, shared by
  *                                   every later manifest that still
  *                                   references them
  *   base/v{v}/manifest/             one zone row per referenced file:
  *                                   (file, cnt, min_c…, max_c…,
  *                                   nulls_c…[, bloom_c…]) — the
  *                                   manifest IS the zone map
  *   base/v{v}/meta/                 1 row: geometry (zone/bloom columns,
  *                                   bloom sizing, column types), layout
  *                                   columns, schema, applied batch
  *                                   high-water mark — written LAST; its
  *                                   _SUCCESS commits the version
  * }}}
  *
  * Why the manifest matters at scale: a plain-directory scan pays a
  * recursive listing (hundreds of thousands of RPCs at 100 TB) before
  * planning anything, and [[ZoneMap.scan]] still pays it for the
  * staleness union. A committed manifest is AUTHORITATIVE — the file
  * list and its zone statistics travel together, so a selective scan
  * plans from one metadata read and never lists the data directory at
  * all. There is no staleness state: a version either committed (files
  * AND zones, atomically) or it didn't happen.
  *
  * Atomicity and crash windows (the contract GraftTableSpec kills the
  * writer to prove):
  *  - every mutation writes NEW data files under `data/g{v+1}` first,
  *    then the v{v+1} manifest, then meta — meta's `_SUCCESS` is the
  *    commit point. A crash anywhere before it leaves the previous
  *    version fully intact and visible; the orphaned generation dir is
  *    unreferenced garbage [[GraftTable.vacuum]] collects.
  *  - data files are immutable and superseded versions are pruned only
  *    AFTER the new commit (best-effort, marker-first), so a reader that
  *    resolved a committed version never has files deleted under it by
  *    the commit itself ([[GraftTable.vacuum]] is the explicit,
  *    caller-scheduled deletion window, as in the public formats).
  *  - appends are LEDGERED: meta carries the high-water batch id and
  *    [[GraftTable.append]] no-ops at or below it — at-least-once
  *    redelivery (a foreachBatch retry re-using its original id) cannot
  *    land rows twice, the [[MaterializedAgg]] exactly-once argument
  *    with files instead of sums.
  *
  * Single-writer per table (the index-family contract); readers are safe
  * concurrently with a writer because they resolve the highest COMMITTED
  * version.
  */
object GraftTable {

  /** Create version 1 from `df`: data files under `data/g1`, zone
    * manifest over them, meta last. `nFiles` bounds the initial file
    * count (0 = keep `df`'s partitioning). A live table already at
    * `path` is SUPERSEDED (readers resolve the highest committed
    * version, so publishing below it would be invisible).
    */
  def create(df: DataFrame, path: String, zoneCols: Seq[String],
      bloomCols: Seq[String] = Nil, nFiles: Int = 0,
      bloomItems: Long = 1000000L, bloomFpp: Double = 0.03,
      firstBatchId: Long = -1L, keepVersions: Int = 1): GraftTable = {
    require(zoneCols.nonEmpty || bloomCols.nonEmpty,
      "a graft table needs at least one zone or bloom column")
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    val spark = df.sparkSession
    val types = (zoneCols ++ bloomCols).distinct
      .map(c => c -> df.schema(c).dataType.sql).toMap
    // firstBatchId seeds the ledger ATOMICALLY with the first data when a
    // stream bootstraps the table ([[ingestStream]]): stamping it after
    // the create commit would open a crash window in which batch 0's rows
    // are committed but unledgered, and its redelivery would double-land
    val meta = Meta(zoneCols, bloomCols, bloomItems, bloomFpp, types,
      layoutCols = Nil, appliedHwm = firstBatchId,
      schemaDdl = df.schema.toDDL, keepVersions = keepVersions)
    val v = currentVersion(spark, path).getOrElse(0L) + 1
    val sized = if (nFiles > 0) df.repartition(nFiles) else df
    publishGeneration(spark, path, sized, v, meta, carryForward = None)
    new GraftTable(spark, path)
  }

  /** Continuous ingest with the bootstrap folded in: the first
    * micro-batch CREATES the table (geometry from the arguments, ledger
    * seeded with its batch id in the same commit), every later batch is
    * a ledgered [[GraftTable.append]] — so a redelivery of ANY batch,
    * including the first, no-ops against the high-water mark and the
    * table is file-level exactly-once end to end.
    */
  def ingestStream(rows: DataFrame, path: String, zoneCols: Seq[String],
      checkpointDir: String, bloomCols: Seq[String] = Nil, nFiles: Int = 0,
      bloomItems: Long = 1000000L, bloomFpp: Double = 0.03): Unit =
    IndexStream.runIndexed(rows, checkpointDir) { (batch, id) =>
      val spark = batch.sparkSession
      currentVersion(spark, path) match {
        case None =>
          create(batch, path, zoneCols, bloomCols, nFiles, bloomItems,
            bloomFpp, firstBatchId = id)
          ()
        case Some(_) =>
          new GraftTable(spark, path).append(batch, id); ()
      }
    }

  /** Continuous UPSERT: one ledgered [[GraftTable.merge]] per
    * micro-batch — latest-wins on `keyCol` within and across batches,
    * file-pruned rewrites, exactly-once under redelivery (the first
    * batch bootstraps the table with its id seeded into the create
    * commit, like [[ingestStream]]). This is the CDC-apply shape: a
    * change stream folds into a queryable table whose every version is
    * a consistent snapshot.
    */
  def mergeStream(rows: DataFrame, path: String, keyCol: String,
      checkpointDir: String, nFiles: Int = 0,
      keepVersions: Int = 1): Unit =
    IndexStream.runIndexed(rows, checkpointDir) { (batch, id) =>
      val spark = batch.sparkSession
      currentVersion(spark, path) match {
        case None =>
          create(batch, path, Seq(keyCol), nFiles = nFiles,
            firstBatchId = id, keepVersions = keepVersions)
          ()
        case Some(_) =>
          new GraftTable(spark, path).merge(batch, keyCol, id); ()
      }
    }

  /** Reopen a committed table; all geometry comes from meta (the family
    * meta-wins rule — `open` never guesses what `create` was told).
    */
  def open(spark: SparkSession, path: String): GraftTable = {
    require(currentVersion(spark, path).nonEmpty,
      s"no committed graft-table version under $path")
    new GraftTable(spark, path)
  }

  // ------------------------------------------------------------ internals --

  private[operators] final case class Meta(zoneCols: Seq[String],
      bloomCols: Seq[String], bloomItems: Long, bloomFpp: Double,
      types: Map[String, String], layoutCols: Seq[String],
      appliedHwm: Long, schemaDdl: String, keepVersions: Int) {
    def zoneMeta: ZoneMap.Meta =
      ZoneMap.Meta(zoneCols, bloomCols, bloomItems, bloomFpp, types)
    def schema: StructType = StructType.fromDDL(schemaDdl)
  }

  /** Additive schema evolution (the public formats' mergeSchema
    * semantics): a batch column with an existing name must match the
    * stored type EXACTLY (parquet cannot re-type already-written files —
    * loud, never a silent coercion); brand-new columns append as
    * nullable, and every earlier file reads them back as null; indexed
    * (zone/bloom) columns must be present in the batch, because the new
    * generation's zone row derives from it. A batch may DROP a non-
    * indexed column — its generation's files read it back as null.
    */
  private[operators] def evolveSchema(m: Meta,
      batch: StructType): StructType = {
    val old = m.schema
    val stored = old.fields.map(f => f.name -> f.dataType).toMap
    batch.fields.foreach { f =>
      stored.get(f.name).foreach { dt =>
        require(dt == f.dataType, s"column ${f.name}: batch type " +
          s"${f.dataType.sql} conflicts with stored ${dt.sql} — " +
          "parquet files cannot re-type")
      }
    }
    (m.zoneCols ++ m.bloomCols).foreach { c =>
      require(batch.fieldNames.contains(c), s"batch must carry indexed " +
        s"column $c — the new generation's zone row derives from it")
    }
    val fresh = batch.fields.filterNot(f => stored.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(old.fields ++ fresh)
  }

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VerRe = "v(\\d+)".r

  /** Committed versions ascending — a version counts only once BOTH its
    * manifest and its meta `_SUCCESS` exist (meta is written last, so
    * meta's marker implies a complete publish; the manifest check guards
    * a manually-truncated directory).
    */
  private def committedVersions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VerRe(n) if f.exists(new Path(st.getPath, "meta/_SUCCESS")) &&
          f.exists(new Path(st.getPath, "manifest/_SUCCESS")) => Some(n.toLong)
        case _ => None
      }).sorted
  }

  private[operators] def currentVersion(
      spark: SparkSession, base: String): Option[Long] =
    committedVersions(spark, base).lastOption

  private def writeMeta(spark: SparkSession, base: String, v: Long,
      m: Meta): Unit = {
    import spark.implicits._
    val (tc, td) = m.types.toSeq.sorted.unzip
    Seq((m.zoneCols, m.bloomCols, m.bloomItems, m.bloomFpp, tc, td,
        m.layoutCols, m.appliedHwm, m.schemaDdl, m.keepVersions))
      .toDF("zone_cols", "bloom_cols", "bloom_items", "bloom_fpp",
        "type_cols", "type_ddls", "layout_cols", "applied_hwm", "schema_ddl",
        "keep_versions")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/v$v/meta")
  }

  private[operators] def readMeta(spark: SparkSession, base: String,
      v: Long): Meta = {
    val r = spark.read.parquet(s"$base/v$v/meta").head()
    Meta(r.getSeq[String](0), r.getSeq[String](1), r.getLong(2),
      r.getDouble(3),
      r.getSeq[String](4).zip(r.getSeq[String](5)).toMap,
      r.getSeq[String](6), r.getLong(7), r.getString(8), r.getInt(9))
  }

  private def listGeneration(spark: SparkSession, gen: String): Seq[String] = {
    val p = new Path(gen)
    val f = fs(spark, gen)
    if (!f.exists(p)) return Nil
    val it = f.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))
        out += st.getPath.toUri.getPath
    }
    out.result()
  }

  /** The whole publish cycle for a mutation that lands `rows` as the
    * version-`v` generation: data files first (Overwrite clears any
    * partial a previous crash left at g{v}), then the manifest — the
    * new files' zone rows plus, for appends, every carried-forward row
    * of the previous manifest — then meta LAST, whose `_SUCCESS` commits
    * the version; finally superseded version dirs are pruned,
    * marker-first, best-effort. Crash anywhere before the meta marker:
    * the previous version stays current and the orphaned generation is
    * vacuum fodder.
    */
  private def publishGeneration(spark: SparkSession, base: String,
      rows: DataFrame, v: Long, meta: Meta,
      carryForward: Option[DataFrame]): Unit = {
    val gen = s"$base/data/g$v"
    rows.write.mode(SaveMode.Overwrite).parquet(gen)
    val files = listGeneration(spark, gen)
    val fresh = ZoneMap.zoneRows(spark.read.parquet(files: _*),
      meta.zoneCols, meta.bloomCols, meta.bloomItems, meta.bloomFpp)
    val manifest = carryForward match {
      case Some(prev) => prev.unionByName(fresh)
      case None => fresh
    }
    manifest.repartition(1) // |files| metadata rows — one file keeps reads cheap
      .write.mode(SaveMode.Overwrite).parquet(s"$base/v$v/manifest")
    writeMeta(spark, base, v, meta)
    val f = fs(spark, base)
    require(f.exists(new Path(s"$base/v$v/meta/_SUCCESS")),
      s"parquet commit left no _SUCCESS under $base/v$v/meta " +
        "(mapreduce.fileoutputcommitter.marksuccessfuljobs disabled?) — " +
        "versioned publication depends on the marker")
    // retention: keep the newest `keepVersions` committed versions (the
    // time-travel window); everything older is pruned marker-first,
    // best-effort — and only AFTER the new commit, so a reader that
    // resolved a retained version never loses it to the commit itself
    committedVersions(spark, base).sorted.dropRight(meta.keepVersions)
      .foreach { old =>
        try {
          f.delete(new Path(s"$base/v$old/meta/_SUCCESS"), false)
          f.delete(new Path(s"$base/v$old"), true)
        } catch { case _: Throwable => () } // prune is best-effort cleanup
      }
  }
}

/** A graft table at rest. Every method resolves the CURRENT committed
  * version at call time, so a handle stays valid across its own
  * mutations and across another handle's (single writer still required
  * for mutations).
  */
final class GraftTable private[operators] (spark: SparkSession,
    val path: String) {
  import GraftTable._

  def version: Long = currentVersion(spark, path).getOrElse(
    sys.error(s"no committed version under $path — concurrent prune?"))

  /** Committed versions ascending — the retained time-travel window
    * (bounded by the table's `keepVersions`; older versions were pruned
    * at commit time).
    */
  def versions(): Seq[Long] = committedVersions(spark, path)

  /** Time travel: the table AS OF a retained version — its own manifest
    * and schema, immutable data files shared with every other version
    * that references them. Fails loudly on a version outside the
    * retention window rather than guessing.
    */
  def readVersion(v: Long): DataFrame = {
    require(versions().contains(v),
      s"version $v is not committed/retained under $path " +
        s"(retained: ${versions().mkString(", ")})")
    val m = readMeta(spark, path, v)
    val fl = manifestDf(v).select("file").collect().map(_.getString(0)).toSeq
    if (fl.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(fl: _*)
  }

  private def metaNow: Meta = readMeta(spark, path, version)

  private def manifestDf(v: Long): DataFrame =
    spark.read.parquet(s"$path/v$v/manifest")

  /** The files the current version references — the authoritative scan
    * list; no directory listing happens anywhere on the read path.
    */
  def files(): Seq[String] =
    manifestDf(version).select("file").collect().map(_.getString(0)).toSeq

  /** Highest batch id folded in (−1 on a fresh table). */
  def lastAppliedBatch(): Long = metaNow.appliedHwm

  /** Full read of the current version. */
  def read(): DataFrame = {
    val m = metaNow
    val fl = files()
    if (fl.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(fl: _*)
  }

  /** Zone-and-bloom-pruned scan under `preds`: manifest rows prune to
    * the surviving file list ([[ZoneMap.pruneZoneRows]], conservative by
    * construction) and the exact predicate re-applies on read — result
    * is row-identical to `read().filter(ZoneMap.predicate(preds))` at
    * every version, pruning only changes how many files open.
    */
  def scan(preds: Seq[ZoneMap.Pred]): DataFrame = {
    require(preds.nonEmpty, "GraftTable.scan needs at least one predicate")
    val m = metaNow
    val (survivors, _) =
      ZoneMap.pruneZoneRows(manifestDf(version), m.zoneMeta, preds)
    if (survivors.isEmpty)
      read().filter(lit(false)) // schema-only, zero splits read
    else spark.read.schema(m.schema).parquet(survivors: _*)
      .filter(ZoneMap.predicate(preds))
  }

  /** How many files a scan under `preds` would open — the observability
    * hook specs and callers use to assert pruning power without reading
    * any data.
    */
  def scanFileCount(preds: Seq[ZoneMap.Pred]): Long =
    ZoneMap.pruneZoneRows(manifestDf(version), metaNow.zoneMeta, preds)
      ._1.size.toLong

  /** Fold a batch in under `batchId`: new data files + the union
    * manifest + the advanced ledger commit as one version. Ids at or
    * below the high-water mark no-op (at-least-once redelivery re-uses
    * its ORIGINAL id — the [[MaterializedAgg.MatAgg.update]] contract;
    * ids must be monotone per table, which micro-batch ids per
    * checkpoint lineage are).
    *
    * @return true if folded, false if skipped as already applied
    */
  def append(batch: DataFrame, batchId: Long): Boolean = {
    val v = version
    val m = readMeta(spark, path, v)
    if (batchId <= m.appliedHwm) {
      DedupIndex.log.warn(s"graft table $path: batch $batchId at or below " +
        s"the applied high-water mark ${m.appliedHwm} — redelivery (or a " +
        "non-monotone id, which violates the append contract) skipped")
      false
    } else {
      val evolved = GraftTable.evolveSchema(m, batch.schema)
      publishGeneration(spark, path, batch, v + 1,
        m.copy(appliedHwm = batchId, schemaDdl = evolved.toDDL),
        carryForward = Some(manifestDf(v)))
      true
    }
  }

  /** Unledgered convenience append for manual (non-stream) callers:
    * ledger id = high-water + 1, so it composes with ledgered streams
    * on the same table.
    */
  def append(batch: DataFrame): Unit = {
    append(batch, lastAppliedBatch() + 1); ()
  }

  /** Continuous ingest: one ledgered [[append]] per micro-batch through
    * the shared [[IndexStream]] harness — the micro-batch id IS the
    * ledger id, so foreachBatch redelivery lands at or below the
    * high-water mark and no-ops: file-level exactly-once, unlike the
    * at-least-once raw-directory sink [[ZoneMap.ingestStream]] documents.
    */
  def ingestStream(rows: DataFrame, checkpointDir: String): Unit =
    IndexStream.runIndexed(rows, checkpointDir)(
      (batch, id) => { append(batch, id); () })

  /** MERGE (latest-wins upsert) at FILE granularity: delete every stored
    * row whose `keyCol` appears in `batch`, insert `batch`, and commit
    * the result as one version — rewriting ONLY the files whose zone
    * [min, max] on `keyCol` can contain a batch key. Every other file's
    * manifest row carries forward untouched, so merge cost scales with
    * the AFFECTED files, not the corpus — on a key-clustered 100 TB
    * table an update batch touches its key range's files and nothing
    * else (the pruned-rewrite idea behind the public formats' MERGE
    * INTO). Selection is conservative-by-construction: a file is
    * skipped only when its zone range provably excludes every batch key
    * (all-null zone rows exclude all non-null keys), decided by one
    * broadcast join of the metadata-scale manifest against the batch —
    * batch keys never visit the driver.
    *
    * Contract: `keyCol` must be zone-indexed; batch keys must be
    * non-null and unique within the batch (both checked loudly — a
    * duplicated key would make "latest wins" order-dependent inside one
    * commit). Ledgered like [[append]]: a redelivered merge no-ops.
    *
    * @return (files rewritten, files carried forward untouched)
    */
  def merge(batch: DataFrame, keyCol: String, batchId: Long): (Long, Long) = {
    val v = version
    val m = readMeta(spark, path, v)
    require(m.zoneCols.contains(keyCol),
      s"merge key $keyCol must be zone-indexed (zones: ${m.zoneCols.mkString(", ")})")
    if (batchId <= m.appliedHwm) {
      DedupIndex.log.warn(s"graft table $path: merge batch $batchId at or " +
        s"below the applied high-water mark ${m.appliedHwm} — redelivery " +
        "(or a non-monotone id) skipped")
      return (0L, 0L)
    }
    val keys = batch.select(col(keyCol))
    require(keys.filter(col(keyCol).isNull).isEmpty,
      s"merge keys ($keyCol) must be non-null")
    require(batch.count() == keys.distinct().count(),
      s"merge batch keys ($keyCol) must be unique within the batch — " +
        "latest-wins is order-dependent otherwise")
    val manifest = manifestDf(v)
    // one broadcast join, manifest side (metadata-scale) broadcast: a
    // file is affected iff SOME batch key falls inside its zone range
    val affected = keys.join(
        broadcast(manifest.select(col("file"),
          col(s"min_$keyCol").as("_mn"), col(s"max_$keyCol").as("_mx"))),
        col(keyCol) >= col("_mn") && col(keyCol) <= col("_mx"))
      .select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val carried = manifest.filter(!col("file").isInCollection(affected))
      // the previous manifest dir is superseded by this publish — cut
      // lineage so the carried rows outlive its pruning
      .localCheckpoint(true)
    val carriedCount = carried.count()
    val evolved = GraftTable.evolveSchema(m, batch.schema)
    val rewrittenRows =
      if (affected.isEmpty) batch
      else spark.read.schema(evolved).parquet(affected.toSeq: _*)
        .join(keys, Seq(keyCol), "left_anti")
        .unionByName(batch, allowMissingColumns = true)
    publishGeneration(spark, path, rewrittenRows, v + 1,
      m.copy(appliedHwm = batchId, schemaDdl = evolved.toDDL),
      carryForward = Some(carried))
    (affected.size.toLong, carriedCount)
  }

  /** [[merge]] with ledger id = high-water + 1, for manual callers. */
  def merge(batch: DataFrame, keyCol: String): (Long, Long) =
    merge(batch, keyCol, lastAppliedBatch() + 1)

  /** Rewrite the table into ~`ceil(rows / targetRows)` files, optionally
    * re-sorted (range-partition + sort-within, restoring [[ZoneMap]]
    * pruning power interleaved appends destroyed — [[Compaction]]'s
    * trade) — and commit files + zones + ledger as ONE version: the
    * choreography [[Compaction]] + [[ZoneMap.rebuild]] required two
    * calls and a staleness window for. Row-preserving by construction.
    *
    * @return (files before, files after)
    */
  def compact(targetRows: Long,
      sortCols: Seq[String] = Nil): (Long, Long) = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val v = version
    val m = readMeta(spark, path, v)
    val before = files()
    val df = spark.read.schema(m.schema).parquet(before: _*)
    val rows = df.count()
    val n = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(n)
    publishGeneration(spark, path, out, v + 1,
      m.copy(layoutCols = sortCols), carryForward = None)
    (before.size.toLong, files().size.toLong)
  }

  /** Relayout along the Z-curve of `cols` ([[Layout.zkey]] — every
    * interleaved column gets narrow per-file ranges, so the manifest
    * prunes on ANY of them) into ~`nFiles` files, committed atomically
    * like [[compact]]. Row-preserving; the layout columns are recorded
    * in meta so later opens can see how the table is clustered.
    */
  def zorder(cols: Seq[String], nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles > 0, s"nFiles must be positive: $nFiles")
    val v = version
    val m = readMeta(spark, path, v)
    val df = spark.read.schema(m.schema).parquet(files(): _*)
    val key = Layout.zkey(cols, Layout.colStats(df, cols), bits)
    val out = df.withColumn("__zkey", key)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
    publishGeneration(spark, path, out, v + 1,
      m.copy(layoutCols = cols), carryForward = None)
  }

  /** Delete data files no committed manifest references (orphans from
    * crashed publishes, generations superseded by compaction/relayout)
    * and empty generation dirs. Safe for readers OF THE CURRENT VERSION;
    * a reader still holding a long-superseded version loses its files —
    * the explicit deletion window every public table format documents
    * (Delta VACUUM). Single-writer: never run concurrently with a
    * mutation.
    *
    * @return number of data files deleted
    */
  def vacuum(): Long = {
    // every RETAINED version's manifest pins its files — time travel
    // must survive a vacuum (only unreferenced-by-anyone files go)
    val referenced = versions().flatMap(ver =>
      manifestDf(ver).select("file").collect().map(_.getString(0))).toSet
    val f = fs(spark, path)
    val dataDir = new Path(s"$path/data")
    if (!f.exists(dataDir)) return 0L
    var deleted = 0L
    f.listStatus(dataDir).filter(_.isDirectory).foreach { gen =>
      val it = f.listFiles(gen.getPath, true)
      val orphans = Seq.newBuilder[Path]
      var live = false
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) {
          val n = st.getPath.getName
          val isData = n.endsWith(".parquet") && !n.startsWith("_") &&
            !n.startsWith(".")
          if (isData) {
            if (referenced(st.getPath.toUri.getPath)) live = true
            else orphans += st.getPath
          }
        }
      }
      val os = orphans.result()
      deleted += os.size
      if (!live) f.delete(gen.getPath, true) // whole generation superseded
      else os.foreach(p => f.delete(p, false))
    }
    deleted
  }
}
