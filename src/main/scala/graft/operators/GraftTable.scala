package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  *   base/data/g{v}_{token}/part-*.parquet
  *                                   immutable data files, written once
  *                                   by one version-v publish ATTEMPT
  *                                   (the token makes racing attempts
  *                                   collision-free), shared by every
  *                                   later manifest referencing them
  *   base/v{v}/manifest/             one zone row per referenced file:
  *                                   (file, cnt, min_c…, max_c…,
  *                                   nulls_c…[, bloom_c…]) — the
  *                                   manifest IS the zone map. File
  *                                   paths are TABLE-ROOT-RELATIVE, so
  *                                   a committed table can be moved,
  *                                   renamed or DR-copied wholesale
  *                                   (legacy absolute rows still
  *                                   resolve — the read shim)
  *   base/v{v}/meta/                 1 row: geometry (zone/bloom columns,
  *                                   bloom sizing, column types), layout
  *                                   columns, schema, applied batch
  *                                   high-water mark, stream-ledger flag
  *   base/v{v}/_publisher            the committing attempt's token
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
  * Atomicity, crash windows and WRITER RACES (GraftTableSpec kills the
  * writer and races two handles to prove this):
  *  - every mutation writes NEW data files under a publish-unique
  *    `data/g{v}_{token}` first, then manifest + meta + the token into a
  *    hidden staging dir, and COMMITS with one atomic directory rename
  *    to `v{v}` — the version becomes visible whole or not at all. A
  *    crash anywhere before the rename leaves the previous version fully
  *    intact; the orphaned generation/staging dirs are unreferenced
  *    garbage [[GraftTable.vacuum]] collects.
  *  - commit conflicts are DETECTED, not silently lost: a publish first
  *    refuses if its target version is already committed (the stale-
  *    handle race), and after the rename re-reads `v{v}/_publisher` —
  *    a loser whose rename raced a winner sees the winner's token,
  *    removes its own debris and throws
  *    `java.util.ConcurrentModificationException`. Exactly one commit
  *    survives; no torn state (racing attempts never share a data or
  *    staging directory, so the loser cannot clobber the winner's
  *    files).
  *  - data files are immutable and superseded versions are pruned only
  *    AFTER the new commit (best-effort, marker-first), so a reader that
  *    resolved a committed version never has files deleted under it by
  *    the commit itself ([[GraftTable.vacuum]] is the explicit,
  *    caller-scheduled deletion window, as in the public formats).
  *  - appends are LEDGERED: meta carries the high-water batch id and
  *    [[GraftTable.append]] no-ops at or below it — at-least-once
  *    redelivery (a foreachBatch retry re-using its original id) cannot
  *    land rows twice, the [[MaterializedAgg]] exactly-once argument
  *    with files instead of sums. A table whose ledger is OWNED by a
  *    streaming checkpoint ([[ingestStream]]/[[mergeStream]] bootstrap)
  *    refuses the unledgered convenience mutations: stamping `hwm + 1`
  *    under a live checkpoint could advance the mark past the stream's
  *    next micro-batch id, which would then no-op as "redelivery" — a
  *    silent batch drop, the exact failure the ledger exists to prevent.
  *
  * Single-writer per table remains the OPERATING contract (the index-
  * family rule); the conflict detection above is the backstop that turns
  * a violated contract into a loud error instead of a lost commit.
  * Readers are safe concurrently with a writer because they resolve the
  * highest COMMITTED version.
  */
object GraftTable {

  /** Op-column value that marks a change row as a row-level DELETE in
    * [[GraftTable.merge]]/[[mergeStream]] — the [[Ingest.applyChanges]]
    * convention (any other value upserts).
    */
  val DeleteOp = "delete"

  /** One DML commit's report: file set algebra plus the EXACT number of
    * rows the condition matched (deleted, or updated — pre/post pairs
    * count once), the `num_affected_rows` SQL clients expect.
    */
  final case class DmlResult(filesRewritten: Long, filesCarried: Long,
    rowsAffected: Long)

  /** Declarative multi-wing MERGE — the full SQL `MERGE INTO` clause
    * algebra ([[GraftTable!.mergeSpec]]): per-wing conditions evaluate
    * ROW-LEVEL over the SAME full-outer join of the affected files (`t`,
    * the stored row) with the batch (`s`) that [[GraftTable!.mergeCond]]
    * already builds, so a three-wing CDC apply (`WHEN MATCHED AND c THEN
    * DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED AND c THEN
    * INSERT`) is ONE commit with NO extra head-snapshot reads — the
    * matched/unmatched split, the clause routing and the insert filter
    * all ride the join the merge pays for anyway.
    *
    *  - `update`: the matched-UPDATE wing's condition over `t`/`s`
    *    (`lit(true)` = unconditional); `None` = no update wing. A
    *    condition-passing update writes `updateExprs` (arbitrary `t`/`s`
    *    expressions — `col("t.value") + col("s.delta")` accumulates) and
    *    `updateCols` (batch-valued columns), preserving every other
    *    stored column; with BOTH empty, every non-key batch column
    *    updates from the batch ([[mergeCond]]'s default).
    *  - `delete`: the matched-DELETE wing's condition over `t`/`s`;
    *    `None` = no delete wing. `deleteFirst` encodes SQL's
    *    first-match-wins clause order: delete-first routes a row passing
    *    both conditions to DELETE; update-first to UPDATE.
    *  - `insert`: the NOT MATCHED wing's condition over `s` only
    *    (`lit(true)` = unconditional); `None` = NO insert wing — an
    *    update/delete-only merge where unmatched batch rows do nothing
    *    (no pre-restriction join needed).
    *  - a matched row no wing claims carries the stored image UNCHANGED
    *    and feeds nothing to the change feed.
    *  - `carryCols`: batch columns visible to the `t`/`s` expressions but
    *    NEVER stored (dropped from inserts and from schema evolution) —
    *    how a CDC op/delta column rides the batch without widening the
    *    table.
    *  - `opCol`: [[DeleteOp]] rows tombstone unconditionally
    *    ([[merge]]'s convention) — how the not-matched-by-source wing's
    *    tombstones union into the same commit.
    */
  final case class MergeSpec(update: Option[Column],
    updateCols: Seq[String] = Nil,
    updateExprs: Seq[(String, Column)] = Nil,
    delete: Option[Column] = None, deleteFirst: Boolean = true,
    insert: Option[Column] = None, carryCols: Seq[String] = Nil,
    opCol: String = null)

  /** Create version 1 from `df`: data files under `data/g1_*`, zone
    * manifest over them, meta last. `nFiles` bounds the initial file
    * count (0 = keep `df`'s partitioning). A live table already at
    * `path` is SUPERSEDED (readers resolve the highest committed
    * version, so publishing below it would be invisible).
    */
  def create(df: DataFrame, path: String, zoneCols: Seq[String],
      bloomCols: Seq[String] = Nil, nFiles: Int = 0,
      bloomItems: Long = 1000000L, bloomFpp: Double = 0.03,
      firstBatchId: Long = -1L, keepVersions: Int = 1,
      changeFeed: Boolean = true, keepHours: Double = -1.0): GraftTable = {
    require(zoneCols.nonEmpty || bloomCols.nonEmpty,
      "a graft table needs at least one zone or bloom column")
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    val spark = df.sparkSession
    val types = (zoneCols ++ bloomCols).distinct
      .map(c => c -> df.schema(c).dataType.sql).toMap
    // firstBatchId seeds the ledger ATOMICALLY with the first data when a
    // stream bootstraps the table ([[ingestStream]]): stamping it after
    // the create commit would open a crash window in which batch 0's rows
    // are committed but unledgered, and its redelivery would double-land.
    // It also flips the stream-ledger flag: from then on the checkpoint
    // lineage OWNS the ledger and manual unledgered mutations refuse.
    val meta = Meta(zoneCols, bloomCols, bloomItems, bloomFpp, types,
      layoutCols = Nil, appliedHwm = firstBatchId,
      schemaDdl = df.schema.toDDL, keepVersions = keepVersions,
      streamed = firstBatchId >= 0L, changeFeed = changeFeed,
      keepHours = keepHours)
    val v = currentVersion(spark, path).getOrElse(0L) + 1
    val sized = if (nFiles > 0) df.repartition(nFiles) else df
    publishGeneration(spark, path, sized, v, meta, carryForward = None,
      op = "create")
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
      bloomItems: Long = 1000000L, bloomFpp: Double = 0.03): Unit = {
    // ONE handle across micro-batches (a handle re-resolves the current
    // version per call, so reuse is safe by contract) — its per-version
    // stats/file caches then serve the whole drain instead of being
    // rebuilt per batch
    var handle: GraftTable = null
    IndexStream.runIndexed(rows, checkpointDir) { (batch, id) =>
      val spark = batch.sparkSession
      if (handle == null && currentVersion(spark, path).isEmpty) {
        handle = create(batch, path, zoneCols, bloomCols, nFiles, bloomItems,
          bloomFpp, firstBatchId = id)
        ()
      } else {
        if (handle == null) handle = new GraftTable(spark, path)
        handle.append(batch, id); ()
      }
    }
  }

  /** Continuous CDC apply: one ledgered [[GraftTable.merge]] per
    * micro-batch — latest-wins on `keyCol` within and across batches,
    * file-pruned rewrites, exactly-once under redelivery (the first
    * batch bootstraps the table with its id seeded into the create
    * commit, like [[ingestStream]]). With `opCol` set, rows whose op is
    * [[DeleteOp]] are row-level TOMBSTONES: their keys are deleted from
    * the affected files and NOT re-inserted — a real change stream's
    * deletes apply as deletes, never silently as upserts. Every version
    * along the way is a consistent snapshot.
    */
  def mergeStream(rows: DataFrame, path: String, keyCol: String,
      checkpointDir: String, nFiles: Int = 0,
      keepVersions: Int = 1, opCol: String = null): Unit = {
    // ONE handle across micro-batches — see [[ingestStream]]
    var handle: GraftTable = null
    IndexStream.runIndexed(rows, checkpointDir) { (batch, id) =>
      val spark = batch.sparkSession
      if (handle == null && currentVersion(spark, path).isEmpty) {
        // bootstrap: deletes against a table that does not exist yet
        // are no-ops by definition — seed from the upsert rows only
        // null-safe: a NULL op is "any other value", i.e. an upsert —
        // a bare =!= would evaluate to null and silently drop the row
        val seed =
          if (opCol == null) batch
          else batch.filter(!(col(opCol) <=> lit(DeleteOp))).drop(opCol)
        // the bootstrap batch honors the same key contract every
        // later merge() enforces — duplicates in batch 0 must refuse
        // as loudly as they would in batch 1
        requireMergeContract(seed, keyCol)
        handle = create(seed, path, Seq(keyCol), nFiles = nFiles,
          firstBatchId = id, keepVersions = keepVersions)
        ()
      } else {
        if (handle == null) handle = new GraftTable(spark, path)
        handle.merge(batch, keyCol, id, opCol); ()
      }
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

  /** ONE aggregate, three contract answers — row count, non-null key
    * count, distinct key count — instead of three separate Spark jobs:
    * this runs per micro-batch on [[mergeStream]]'s hot path, and
    * GraftTableSpec pins the single-job shape with a listener.
    *
    * @return the batch row count (free from the same aggregate; callers
    *         use it to bound driver-adjacent work like the bloom-probe
    *         hash array)
    */
  private[graft] def requireMergeContract(batch: DataFrame,
      keyCol: String): Long = requireMergeContract(batch, Seq(keyCol))

  /** Composite form: the key is the TUPLE — every component non-null,
    * tuples unique within the batch (same single-aggregate shape).
    */
  private[graft] def requireMergeContract(batch: DataFrame,
      keyCols: Seq[String]): Long = {
    val ks = keyCols.map(col)
    val allSet = ks.map(_.isNotNull).reduce(_ && _)
    val stats = labeled(batch.sparkSession, "graft:merge:contract") {
      withoutAqe(batch.sparkSession) {
        batch.agg(count(lit(1)).as("n"),
          count(when(allSet, lit(1))).as("nk"),
          countDistinct(ks.head, ks.tail: _*).as("nd")).head()
      }
    }
    val (n, nk, nd) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    require(n == nk,
      s"merge keys (${keyCols.mkString(", ")}) must be non-null: " +
        s"${n - nk} null-component keys in the batch")
    require(nk == nd,
      s"merge batch keys (${keyCols.mkString(", ")}) must be unique " +
        s"within the batch ($nk rows, $nd distinct) — latest-wins is " +
        "order-dependent otherwise")
    n
  }


  private[operators] final case class Meta(zoneCols: Seq[String],
      bloomCols: Seq[String], bloomItems: Long, bloomFpp: Double,
      types: Map[String, String], layoutCols: Seq[String],
      appliedHwm: Long, schemaDdl: String, keepVersions: Int,
      streamed: Boolean, bloomScheme: String = ZoneMap.BloomScheme,
      changeFeed: Boolean = true, keepHours: Double = -1.0) {
    def zoneMeta: ZoneMap.Meta =
      ZoneMap.Meta(zoneCols, bloomCols, bloomItems, bloomFpp, types,
        bloomScheme)
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

  /** Label the Spark jobs `body` submits (guide-§1.5 observability: the
    * commit protocol runs several small jobs per mutation and an
    * unlabeled UI/job-profile cannot attribute them). Thread-local;
    * restores the caller's description.
    */
  private[operators] def labeled[T](spark: SparkSession, desc: String)(
      body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Run a METADATA/BATCH-BOUNDED planning action without AQE: adaptive
    * execution re-optimizes per exchange, which costs one extra scheduled
    * job per stage — pure overhead for the commit protocol's small
    * bounded queries (batch contract aggregate, file-candidacy probe),
    * whose shuffles are already sized by `spark.sql.shuffle.partitions`
    * and gain nothing from runtime re-planning (AQE's skew handling is
    * join-only and these plans' joins are broadcast by construction).
    * The DATA-scale legs — generation writes, the merge join itself —
    * keep AQE untouched. Restores the caller's setting.
    */
  private[operators] def withoutAqe[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private val VerRe = "v(\\d+)".r

  private def isCommitted(f: FileSystem, base: String, v: Long): Boolean =
    f.exists(new Path(s"$base/v$v/meta/_SUCCESS")) &&
      f.exists(new Path(s"$base/v$v/manifest/_SUCCESS"))

  /** Committed versions ascending — a version counts only once BOTH its
    * manifest and its meta `_SUCCESS` exist (the publish rename is
    * atomic, so both appear together; the check guards a manually-
    * truncated directory).
    */
  private def committedVersions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VerRe(n) if isCommitted(f, base, n.toLong) => Some(n.toLong)
        case _ => None
      }).sorted
  }

  private[operators] def currentVersion(
      spark: SparkSession, base: String): Option[Long] =
    committedVersions(spark, base).lastOption

  /** Meta is ONE driver-sized record per version: serializing it as a
    * JSON blob written directly through the FileSystem (plus the
    * `_SUCCESS` marker [[isCommitted]] gates on) costs zero Spark jobs,
    * where the previous one-row-parquet form paid a full job per commit
    * — per-commit latency, the hot axis of every DML/stream lifecycle.
    * Tables committed before the switch read back through the parquet
    * fallback in [[readMeta]]; the on-disk contract (meta dir +
    * `_SUCCESS`, atomic under the publish rename) is unchanged.
    */
  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    val f = fs(spark, dir)
    writeSmall(f, new Path(dir, "meta.json"), metaJson(m))
    writeSmall(f, new Path(dir, "_SUCCESS"), "")
  }

  private def metaJson(m: Meta): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val (tc, td) = m.types.toSeq.sorted.unzip
    JsonMethods.compact(JsonMethods.render(
      ("zone_cols" -> m.zoneCols) ~ ("bloom_cols" -> m.bloomCols) ~
        ("bloom_items" -> m.bloomItems) ~ ("bloom_fpp" -> m.bloomFpp) ~
        ("type_cols" -> tc) ~ ("type_ddls" -> td) ~
        ("layout_cols" -> m.layoutCols) ~ ("applied_hwm" -> m.appliedHwm) ~
        ("schema_ddl" -> m.schemaDdl) ~ ("keep_versions" -> m.keepVersions) ~
        ("streamed" -> m.streamed) ~ ("bloom_scheme" -> m.bloomScheme) ~
        ("change_feed" -> m.changeFeed) ~ ("keep_hours" -> m.keepHours)))
  }

  private def parseMetaJson(s: String, base: String): Meta = {
    import org.json4s.DefaultFormats
    import org.json4s.jackson.JsonMethods
    implicit val fmts: DefaultFormats.type = DefaultFormats
    val j = JsonMethods.parse(s)
    val m = Meta(
      (j \ "zone_cols").extract[Seq[String]],
      (j \ "bloom_cols").extract[Seq[String]],
      (j \ "bloom_items").extract[Long],
      (j \ "bloom_fpp").extract[Double],
      (j \ "type_cols").extract[Seq[String]]
        .zip((j \ "type_ddls").extract[Seq[String]]).toMap,
      (j \ "layout_cols").extract[Seq[String]],
      (j \ "applied_hwm").extract[Long],
      (j \ "schema_ddl").extract[String],
      (j \ "keep_versions").extract[Int],
      (j \ "streamed").extract[Boolean],
      (j \ "bloom_scheme").extract[String],
      (j \ "change_feed").extract[Boolean],
      (j \ "keep_hours").extract[Double])
    requireBloomScheme(m, base)
    m
  }

  private def requireBloomScheme(m: Meta, base: String): Unit =
    require(m.bloomCols.isEmpty || m.bloomScheme == ZoneMap.BloomScheme,
      s"graft table $base has manifest blooms under hash scheme " +
        s"'${m.bloomScheme}' but this engine probes " +
        s"'${ZoneMap.BloomScheme}' — tables committed before the UTC cast " +
        "pin hashed session-local timestamp strings and can silently " +
        "false-negative on probe; rewrite the table (compact) instead of " +
        "probing it")

  private[operators] def readMeta(spark: SparkSession, base: String,
      v: Long): Meta = {
    readSmall(fs(spark, base), new Path(s"$base/v$v/meta/meta.json")) match {
      case Some(s) => parseMetaJson(s, base)
      case None => readMetaParquet(spark, base, v) // pre-JSON commits
    }
  }

  private def readMetaParquet(spark: SparkSession, base: String,
      v: Long): Meta = {
    val df = spark.read.parquet(s"$base/v$v/meta")
    val r = df.head()
    def ix(n: String) = r.fieldIndex(n)
    // `streamed` arrived after the first committed tables: default false
    // (pre-flag tables were never stream-bootstrapped under the flag's
    // contract anyway — the shim only widens, never changes, semantics)
    val streamed = df.schema.fieldNames.contains("streamed") &&
      r.getBoolean(ix("streamed"))
    // bloom bits hash what the scheme tag says ([[ZoneMap.BloomScheme]]);
    // a meta without the tag predates it — unknown hash basis, refused
    // below iff the table actually carries blooms (min/max pruning is
    // scheme-independent and keeps working)
    val scheme =
      if (df.schema.fieldNames.contains("bloom_scheme"))
        r.getString(ix("bloom_scheme"))
      else ""
    // policy fields that arrived after the first committed tables read
    // back with their pre-field defaults (feed on; no time retention) —
    // the shim only widens, never changes, committed semantics
    val changeFeed = !df.schema.fieldNames.contains("change_feed") ||
      r.getBoolean(ix("change_feed"))
    val keepHours =
      if (df.schema.fieldNames.contains("keep_hours"))
        r.getDouble(ix("keep_hours"))
      else -1.0
    val m = Meta(r.getSeq[String](ix("zone_cols")),
      r.getSeq[String](ix("bloom_cols")),
      r.getLong(ix("bloom_items")), r.getDouble(ix("bloom_fpp")),
      r.getSeq[String](ix("type_cols"))
        .zip(r.getSeq[String](ix("type_ddls"))).toMap,
      r.getSeq[String](ix("layout_cols")), r.getLong(ix("applied_hwm")),
      r.getString(ix("schema_ddl")), r.getInt(ix("keep_versions")), streamed,
      scheme, changeFeed, keepHours)
    requireBloomScheme(m, base)
    m
  }

  /** The new generation's data files as (path, on-disk bytes) — the
    * byte sizes ride into the manifest so size estimation
    * ([[GraftTable!.approxStats]]) reads REAL file bytes instead of
    * guessing rows × schema width.
    */
  private def listGeneration(spark: SparkSession,
      gen: String): Seq[(String, Long)] = {
    val p = new Path(gen)
    val f = fs(spark, gen)
    if (!f.exists(p)) return Nil
    val it = f.listFiles(p, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))
        out += ((st.getPath.toUri.getPath, st.getLen))
    }
    out.result()
  }

  /** Is `e` the SHAPE of a lost commit race rather than a conflict
    * exception proper? Under contention with a short retention window
    * (`keepVersions = 1`), a racing winner's post-commit prune can
    * delete the loser's resolved version dir MID-ATTEMPT — the loser
    * then fails with a missing-path error from a metadata read instead
    * of reaching its own publish's conflict check. Callers treat these
    * as rebasable ONLY when the head provably advanced past their base
    * version (otherwise a genuine I/O failure must surface).
    */
  private[operators] def raceArtifact(e: Throwable): Boolean = e match {
    case null => false
    case _: java.io.FileNotFoundException => true
    case _: org.apache.spark.sql.AnalysisException => true
    case se: org.apache.spark.SparkException => raceArtifact(se.getCause)
    case _ => false
  }

  private def conflict(base: String, v: Long): Nothing =
    throw new java.util.ConcurrentModificationException(
      s"graft table $base: version $v was committed by another writer — " +
        "this handle raced a concurrent mutation (single-writer contract " +
        "violated); re-open the table and retry against the new head")

  /** Process-wide manifest caches, keyed by (table root, version,
    * publisher token): a committed version's manifest is immutable and
    * the token is unique per commit ATTEMPT, so the key is stable across
    * handles AND across a table being dropped and re-created at the same
    * path (the new incarnation's commits carry fresh tokens — a stale
    * entry can never be served). Handle-scoped caches (the r17 shape)
    * missed exactly the hot case: the SQL door opens a fresh handle per
    * statement, so every statement re-collected the same file list and
    * re-aggregated the same stats as small Spark jobs. Bounded: metadata
    * strings/longs only, cleared wholesale past the cap.
    */
  private val statsCacheG = scala.collection.concurrent.TrieMap
    .empty[(String, Long, String), (Long, Long)]
  private val manifestSchemaG = scala.collection.concurrent.TrieMap
    .empty[(String, Long, String), StructType]
  /** A committed version's NON-BLOOM manifest columns, collected once
    * process-wide (schema + rows): the metadata every per-statement ask
    * needs — file list, size/row stats, per-column zone ranges, merge
    * range-candidacy — served from ONE collect per version instead of
    * one Spark job per ask. Bloom bytes (the only heavy manifest
    * payload) are EXCLUDED and stay executor-side; what remains is the
    * same O(|files|) of strings/longs [[GraftTable!.storedFiles]] always
    * collected.
    */
  private val snapCacheG = scala.collection.concurrent.TrieMap
    .empty[(String, Long, String), (StructType, Array[org.apache.spark.sql.Row])]
  private def boundCache(
      m: scala.collection.concurrent.TrieMap[(String, Long, String), _]): Unit =
    if (m.size > 4096) m.clear()

  private def writeSmall(f: FileSystem, p: Path, s: String): Unit = {
    val out = f.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readSmall(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }

  /** The whole publish cycle for a mutation that lands `rows` as the
    * version-`v` generation. Collision-free until one atomic commit:
    * data files land under a publish-unique `data/g{v}_{token}`, the
    * manifest (new files' zone rows, paths RELATIVIZED to the table
    * root, plus any carried-forward rows of the previous manifest), the
    * meta and the publisher token are staged under a hidden dir, and ONE
    * directory rename makes `v{v}` visible whole. The token read back
    * after the rename certifies whose attempt won; a loser cleans its
    * debris and throws `ConcurrentModificationException` — exactly one
    * commit per version survives, and the winner's files were never
    * touched by the loser (no shared directories before the commit
    * point). A crash anywhere before the rename leaves the previous
    * version current and only vacuum-fodder behind; an existing
    * UNCOMMITTED `v{v}` dir can only be such a remnant (a live racer
    * stages elsewhere) and is cleared.
    */
  /** Is there a committed graft table at `path`? */
  def exists(spark: SparkSession, path: String): Boolean =
    currentVersion(spark, path).isDefined

  /** Zero-copy SHALLOW CLONE (the Delta `CLONE` shape): a NEW table at
    * `destPath` whose v1 manifest references the SOURCE's data files by
    * absolute path — no data moves, zone ranges and blooms copy verbatim
    * (the clone prunes exactly like the source from birth), and the
    * commit itself is metadata-sized regardless of table size: cloning
    * 100 TB costs one manifest write. Copy-on-write from there: every
    * clone mutation writes its own generations under the clone root; a
    * merge/DML rewrite replaces absolute source references with
    * clone-local files for the affected stripe only, and the two tables
    * diverge file-by-file. The clone's ledger resets (hwm −1, stream
    * flag off — a clone is a new mutation lineage, like Delta's
    * transaction-id reset) and `keepVersions` is the clone's own.
    *
    * The one shared-fate caveat, same as the public formats': `vacuum`
    * on the SOURCE deletes files only the source's retained versions
    * reference — a clone holding absolute references into a vacuumed
    * source breaks. Clone from sources whose data files are stable, or
    * snapshot-copy instead. The CLONE's own vacuum is safe: it sweeps
    * only `destPath/data`, never out-of-root references.
    *
    * @param versionAsOf clone the source AS OF a retained version
    *                    (default: current head)
    */
  def shallowClone(spark: SparkSession, srcPath: String, destPath: String,
      versionAsOf: Long = -1L, keepVersions: Int = 1): GraftTable = {
    val src = open(spark, srcPath)
    val v = if (versionAsOf >= 0L) versionAsOf else src.version
    require(src.versions().contains(v),
      s"clone source version $v is not committed/retained under $srcPath " +
        s"(retained: ${src.versions().mkString(", ")})")
    require(currentVersion(spark, destPath).isEmpty,
      s"clone destination $destPath is already a graft table")
    require(fs(spark, srcPath).makeQualified(new Path(srcPath)).toUri.getPath
      != fs(spark, destPath).makeQualified(new Path(destPath)).toUri.getPath,
      "clone destination == source")
    val m = readMeta(spark, srcPath, v)
    // fully qualify BEFORE rewriting manifest refs: a relative srcPath
    // would emit refs without a leading '/', which the clone's resolve()
    // re-roots under the CLONE — breaking every read. makeQualified pins
    // the absolute form (authority-free, like every path key in this
    // engine — ZoneMap.canonical's convention).
    val srcRoot = fs(spark, srcPath)
      .makeQualified(new Path(srcPath)).toUri.getPath
    val manifest = src.manifestDf(v).withColumn("file",
      when(col("file").startsWith("/"), col("file"))
        .otherwise(concat(lit(srcRoot + "/"), col("file"))))
    val f = fs(spark, destPath)
    val token = java.util.UUID.randomUUID().toString
    val staging = s"$destPath/.v1_stage_$token"
    labeled(spark, "graft:clone:manifest") {
      withoutAqe(spark) {
        manifest.coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$staging/manifest")
      }
    }
    writeMeta(spark, s"$staging/meta",
      m.copy(appliedHwm = -1L, streamed = false,
        keepVersions = keepVersions))
    writeSmall(f, new Path(s"$staging/_op"), "clone")
    writeSmall(f, new Path(s"$staging/_publisher"), token)
    val verDir = new Path(s"$destPath/v1")
    val renamed =
      try f.rename(new Path(staging), verDir)
      catch { case _: Throwable => false }
    if (!(renamed &&
        readSmall(f, new Path(verDir, "_publisher")).contains(token))) {
      try f.delete(new Path(staging), true) catch { case _: Throwable => () }
      conflict(destPath, 1L)
    }
    // register the clone against its SOURCE so a source vacuum/drop/
    // rename is LOUD instead of silently breaking the clone's absolute
    // references ([[GraftTable!.vacuum]]'s clone-safety check, shared by
    // the catalog's DROP/RENAME guards). Best-effort: a read-only source
    // filesystem degrades to the documented caveat.
    try registerClone(spark, srcPath, destPath)
    catch { case _: Throwable => () }
    new GraftTable(spark, destPath)
  }

  /** Register `destPath` as a live shallow clone of `srcPath` — the
    * record [[GraftTable!.vacuum]] and the catalog's DROP/RENAME guards
    * consult before an operation that would break the clone's absolute
    * manifest references. Written by [[shallowClone]]; re-written when a
    * registered clone itself moves (catalog RENAME).
    */
  private[graft] def registerClone(spark: SparkSession, srcPath: String,
      destPath: String): Unit = {
    val token = java.util.UUID.randomUUID().toString
    writeSmall(fs(spark, srcPath), new Path(s"$srcPath/_clones/$token"),
      fs(spark, destPath).makeQualified(new Path(destPath)).toUri.getPath)
  }

  private[operators] def publishGeneration(spark: SparkSession, base: String,
      rows: DataFrame, v: Long, meta: Meta,
      carryForward: Option[DataFrame],
      changes: Option[DataFrame] = None,
      changesEmpty: Boolean = false,
      op: String = "write",
      carrySnap: Option[(StructType, Seq[org.apache.spark.sql.Row])] = None)
      : Unit = {
    val f = fs(spark, base)
    val verDir = new Path(s"$base/v$v")
    if (isCommitted(f, base, v)) conflict(base, v)
    val token = java.util.UUID.randomUUID().toString
    if (f.exists(verDir)) {
      // an occupant that is not a committed version can only be debris —
      // but NEVER delete it in place: between an isCommitted check and a
      // delete, a racing writer may have atomically renamed its committed
      // staging dir into v{v}, and deleting that would silently lose an
      // ACKNOWLEDGED commit (the TOCTOU the conflict backstop exists to
      // prevent). Rename the occupant ASIDE atomically instead, inspect
      // it at leisure, and restore it if it turns out to be a commit we
      // raced — a genuinely torn remnant stays aside as hidden
      // vacuum-fodder. (Two-writer safe; a three-way race on one version
      // is outside the backstop's guarantee, like the public formats'.)
      val aside = new Path(s"$base/.v${v}_aside_$token")
      val moved = try f.rename(verDir, aside) catch { case _: Throwable => false }
      if (!moved) conflict(base, v) // undisplaceable occupant = a racer
      if (f.exists(new Path(aside, "meta/_SUCCESS")) &&
        f.exists(new Path(aside, "manifest/_SUCCESS"))) {
        try f.rename(aside, verDir) catch { case _: Throwable => () }
        conflict(base, v)
      }
    }
    val gen = s"$base/data/g${v}_$token"
    labeled(spark, s"graft:publish:generation v$v ($op)") {
      rows.write.mode(SaveMode.Overwrite).parquet(gen)
    }
    val files = listGeneration(spark, gen)
    val rootNorm = new Path(base).toUri.getPath
    // root-relative storage: the committed table survives a directory
    // move/rename/DR-copy; absolute rows (legacy, or files genuinely
    // outside the root) pass through and resolve as-is on read
    def relativize(p: String): String =
      if (p.startsWith(rootNorm + "/")) p.drop(rootNorm.length + 1) else p
    // ZONE STATS FROM THE FOOTERS the generation write just produced
    // ([[FooterStats]], the Delta/Iceberg stats-at-write idea): min/max/
    // null-count/row-count per file read from row-group metadata, so the
    // manifest job stops RE-READING the whole generation — at 100 TB that
    // second full pass is the single largest per-commit cost, and on the
    // bench it is one full Spark scan per commit. Bloom-indexed tables
    // (bits need the values) and any footer outside the provably-exact
    // cases fall back to the aggregate pass unchanged.
    val footerRows: Option[Seq[org.apache.spark.sql.Row]] =
      if (meta.bloomCols.nonEmpty) None
      else FooterStats.zoneRowsFromFooters(
        spark.sparkContext.hadoopConfiguration, files, meta.zoneCols,
        rows.schema).map(_.map(r =>
        org.apache.spark.sql.Row.fromSeq(
          relativize(r.getString(0)) +: r.toSeq.tail)))
    val footerSchema = FooterStats.manifestSchema(meta.zoneCols, rows.schema)
    // the WHOLE new manifest driver-side when both halves already are —
    // fresh rows from the footers just written, carried rows from the
    // previous version's snapshot: written without a Spark job
    // ([[ManifestIo.write]]) and seeding the new version's snapshot for
    // free after the commit. Any gap (bloom table, exotic type, write
    // failure) falls back to the engine write path unchanged.
    val driverManifest: Option[(StructType, Seq[org.apache.spark.sql.Row])] =
      footerRows.flatMap { fr =>
        carryForward match {
          case None => Some((footerSchema, fr))
          case Some(_) => carrySnap.map { case (cs, cr) =>
            ManifestIo.unionAligned(cs, cr, footerSchema, fr) }
        }
      }.filter(m => ManifestIo.driverWritable(m._1))
    lazy val footerFresh = footerRows.map { rs =>
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rs.asJava, footerSchema)
    }
    lazy val fresh = footerFresh.getOrElse {
      // an all-delete merge can land a generation with ZERO data files —
      // the zone-row schema still has to come from somewhere, so derive it
      // from the (empty) generation rows instead of a zero-path read
      // schema pinned from the rows just written: skips the read-back's
      // driver-side footer inference — the generation IS that schema
      val genRows =
        if (files.isEmpty) rows.limit(0)
        else spark.read.schema(rows.schema).parquet(files.map(_._1): _*)
      import spark.implicits._
      // REAL on-disk bytes per file, joined onto the zone rows (both
      // metadata-scale) before relativization: size estimation must never
      // guess from rows × schema width when the filesystem already told us
      // — a string-heavy table under-estimates by 100× otherwise and a
      // too-small sizeInBytes broadcasts what should shuffle (driver OOM)
      val sizes = files.toDF("file", "bytes")
      ZoneMap.zoneRows(genRows,
        meta.zoneCols, meta.bloomCols, meta.bloomItems, meta.bloomFpp)
        .join(broadcast(sizes), Seq("file"), "left")
        .withColumn("file",
          when(col("file").startsWith(rootNorm + "/"),
            col("file").substr(lit(rootNorm.length + 2), lit(Int.MaxValue)))
            .otherwise(col("file")))
    }
    val staging = s"$base/.v${v}_stage_$token"
    val wroteDriver = driverManifest.exists { case (ms, mr) =>
      ManifestIo.write(spark, s"$staging/manifest", ms, mr) }
    if (!wroteDriver) {
      val manifest = carryForward match {
        // allowMissingColumns: a carried manifest committed before the
        // `bytes` column reads back null there — approxStats falls back to
        // rows × width for exactly those rows
        case Some(prev) => prev.unionByName(fresh, allowMissingColumns = true)
        case None => fresh
      }
      labeled(spark, s"graft:publish:manifest v$v ($op)") {
        // |files| metadata rows — one file keeps reads cheap. coalesce, not
        // repartition: no exchange, so the whole write (carried-manifest
        // read + fresh rows) is ONE single-task job, and AQE has no stage
        // boundary to re-optimize (the repartition form cost 2 jobs/commit)
        withoutAqe(spark) {
          manifest.coalesce(1)
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/manifest")
        }
      }
    }
    writeMeta(spark, s"$staging/meta", meta)
    require(f.exists(new Path(s"$staging/meta/_SUCCESS")),
      s"meta commit left no _SUCCESS under $staging/meta — " +
        "versioned publication depends on the marker")
    // the ROW-LEVEL change slice, persisted inside the same atomic commit
    // (Delta CDF's _change_data discipline): when the mutation knows its
    // exact row-level effect — merge computes it anyway, compaction's is
    // empty by definition — the slice commits alongside the data and
    // [[GraftTable.readChanges]] serves it instead of the whole-file diff.
    // A table created with `changeFeed = false` (no feed consumers) skips
    // the persistence — and its cost: the slice DataFrame is lazy, so
    // dropping it here means the extra write job never runs — and
    // [[GraftTable.readChanges]] falls back to the file-granularity
    // manifest diff, which stays exact (just coarser).
    // `changesEmpty` is the PROVABLY-EMPTY slice (relayouts, policy/DDL
    // commits: row-preserving by construction): a zero-byte marker file
    // replaces the empty-parquet Spark job — same feed semantics
    // ([[GraftTable.readChanges]]/[[GraftTable!.commitChanges]] serve an
    // empty slice for the version), one job less per commit.
    if (meta.changeFeed) {
      if (changesEmpty) writeSmall(f, new Path(s"$staging/_changes_none"), "")
      else changes.foreach(c => labeled(spark, s"graft:publish:changes v$v") {
        c.write.mode(SaveMode.Overwrite).parquet(s"$staging/_changes")
      })
    }
    // the operation marker feeds [[GraftTable.history]]; written inside
    // the staged commit so it is atomic with everything else
    writeSmall(f, new Path(s"$staging/_op"), op)
    writeSmall(f, new Path(s"$staging/_publisher"), token)
    // the commit point: one atomic rename publishes the version whole
    val renamed =
      try f.rename(new Path(staging), verDir)
      catch { case _: Throwable => false }
    val won = renamed &&
      readSmall(f, new Path(verDir, "_publisher")).contains(token)
    if (!won) {
      // lost the race: remove own debris (including the rename-into-dir
      // fallback some local filesystems perform), leave the winner alone
      try f.delete(new Path(staging), true) catch { case _: Throwable => () }
      try f.delete(new Path(verDir, s".v${v}_stage_$token"), true)
      catch { case _: Throwable => () }
      try f.delete(new Path(gen), true) catch { case _: Throwable => () }
      conflict(base, v)
    }
    // the driver-written manifest IS the new version's snapshot: seed the
    // process-wide cache so no consumer ever pays the snap collect job
    // for this version (the rows equal a collect of the file just
    // written, by construction)
    if (wroteDriver) driverManifest.foreach { case (ms, mr) =>
      boundCache(snapCacheG)
      snapCacheG.put((rootNorm, v, token), (ms, mr.toArray))
    }
    // retention: keep the newest `keepVersions` committed versions (the
    // time-travel window); with `keepHours >= 0` a version ALSO survives
    // while its commit is younger than that many hours (the RETAIN n
    // HOURS twin operators actually configure — count-based alone prunes
    // a burst of commits instantly). Everything past BOTH windows is
    // pruned marker-first, best-effort — and only AFTER the new commit,
    // so a reader that resolved a retained version never loses it to the
    // commit itself.
    val cutoff =
      if (meta.keepHours < 0) Long.MaxValue
      else System.currentTimeMillis() - (meta.keepHours * 3600000L).toLong
    committedVersions(spark, base).sorted.dropRight(meta.keepVersions)
      .foreach { old =>
        try {
          val young = meta.keepHours >= 0 &&
            f.getFileStatus(new Path(s"$base/v$old")).getModificationTime >=
              cutoff
          if (!young) {
            f.delete(new Path(s"$base/v$old/meta/_SUCCESS"), false)
            f.delete(new Path(s"$base/v$old"), true)
          }
        } catch { case _: Throwable => () } // prune is best-effort cleanup
      }
  }
}

/** A graft table at rest. Every method resolves the CURRENT committed
  * version at call time, so a handle stays valid across its own
  * mutations and across another handle's (single writer still required
  * for mutations — a violated race is detected, not lost: see
  * [[GraftTable$]] atomicity notes).
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

  private val rootNorm = new Path(path).toUri.getPath

  /** Manifest rows store table-root-relative paths ([[publishGeneration]]);
    * absolute rows (legacy tables, out-of-root files) pass through.
    */
  private def resolve(file: String): String =
    if (file.startsWith("/")) file else s"$rootNorm/$file"

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
    val fl = storedFiles(v).map(resolve)
    if (fl.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(fl: _*)
  }

  private def metaNow: Meta = readMeta(spark, path, version)

  /** Manifest schema read DRIVER-SIDE from the (single) manifest file's
    * footer, memoized process-wide: a bare `spark.read.parquet` runs
    * schema inference as its own Spark JOB, and the commit/read paths
    * open the manifest several times per statement — that job was ~40 ms
    * of scheduling per ask, every ask. Falls back to engine inference if
    * the directory shape is unexpected.
    */
  private def manifestSchema(v: Long): StructType = {
    val key = (rootNorm, v, commitToken(v))
    GraftTable.boundCache(GraftTable.manifestSchemaG)
    GraftTable.manifestSchemaG.getOrElseUpdate(key, {
      val dir = new Path(s"$path/v$v/manifest")
      val f = fs(spark, path)
      val file = f.listStatus(dir).find(st => st.isFile &&
        st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      file match {
        case Some(st) =>
          val in = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              st.getPath, spark.sparkContext.hadoopConfiguration))
          val msg = try in.getFooter.getFileMetaData.getSchema
            finally in.close()
          new org.apache.spark.sql.execution.datasources.parquet
            .ParquetToSparkSchemaConverter(
              org.apache.spark.sql.internal.SQLConf.get).convert(msg)
        case None => spark.read.parquet(dir.toString).schema
      }
    })
  }

  private def manifestDf(v: Long): DataFrame =
    spark.read.schema(manifestSchema(v)).parquet(s"$path/v$v/manifest")

  /** This handle's (version → publisher token) memo — one tiny FS read
    * per version instead of one per cache lookup. Handle-scoped like the
    * single-writer contract that makes it safe.
    */
  private val tokenCache =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  private def commitToken(v: Long): String =
    tokenCache.getOrElseUpdate(v,
      readSmall(fs(spark, path), new Path(s"$path/v$v/_publisher"))
        .getOrElse(""))

  /** A committed version's manifest is IMMUTABLE — its non-bloom rows
    * are collected once PROCESS-WIDE ([[GraftTable.snapCacheG]]) and
    * every metadata ask (file list, stats, column ranges, merge
    * candidacy ranges) folds over the snapshot driver-side instead of
    * running its own Spark job.
    */
  private def manifestSnap(v: Long)
      : (StructType, Array[org.apache.spark.sql.Row]) = {
    val key = (rootNorm, v, commitToken(v))
    GraftTable.snapCacheG.get(key).getOrElse {
      GraftTable.boundCache(GraftTable.snapCacheG)
      GraftTable.snapCacheG.getOrElseUpdate(key,
        GraftTable.labeled(spark, s"graft:manifest:snap v$v") {
          GraftTable.withoutAqe(spark) {
            val mdf = manifestDf(v)
            val cols = mdf.schema.fieldNames
              .filterNot(_.startsWith("bloom_"))
            val pruned = mdf.select(cols.map(col): _*)
            (pruned.schema, pruned.collect())
          }
        })
    }
  }

  /** The version's file list, off the manifest snapshot. */
  private def storedFiles(v: Long): Seq[String] = {
    val (schema, rows) = manifestSnap(v)
    val ix = schema.fieldIndex("file")
    rows.toSeq.map(_.getString(ix))
  }

  /** The previous version's snapshot minus `drop`ped files, as
    * [[GraftTable.publishGeneration]]'s `carrySnap` — the carried half
    * of a driver-written manifest. None on bloom tables: the snapshot
    * deliberately excludes the bloom bytes a carried manifest must keep,
    * so those tables stay on the engine write path.
    */
  private def carrySnapOf(v: Long, m: Meta, drop: Set[String] = Set.empty)
      : Option[(StructType, Seq[org.apache.spark.sql.Row])] =
    if (m.bloomCols.nonEmpty) None
    else {
      val (s, r) = manifestSnap(v)
      val fIx = s.fieldIndex("file")
      Some((s,
        if (drop.isEmpty) r.toSeq
        else r.toSeq.filterNot(x => drop(x.getString(fIx)))))
    }

  /** The files the current version references (resolved to full paths) —
    * the authoritative scan list; no directory listing happens anywhere
    * on the read path.
    */
  def files(): Seq[String] = storedFiles(version).map(resolve)

  /** Highest batch id folded in (−1 on a fresh table). */
  def lastAppliedBatch(): Long = metaNow.appliedHwm

  /** Full read of the current version. */
  def read(): DataFrame = readVersion(version)

  /** One pruning pass for version `v` under a CNF spec: driver-side over
    * the manifest snapshot when the table has no blooms and every probe
    * literal matches its zone value class ([[ZoneMap.pruneSnapCnf]] —
    * zero Spark jobs), the executor (file, _keep) collect otherwise —
    * identical survivor algebra either way.
    */
  private def pruneVersion(v: Long, m: Meta, cnf: ZoneMap.Cnf)
      : (Seq[String], Set[String]) = {
    val driver =
      if (m.bloomCols.nonEmpty) None
      else {
        val (ss, sr) = manifestSnap(v)
        ZoneMap.pruneSnapCnf(ss, sr, m.zoneMeta, cnf)
      }
    driver.getOrElse(
      ZoneMap.pruneZoneRowsCnf(manifestDf(v), m.zoneMeta, cnf))
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
    val (survivors, _) = pruneVersion(version, m, Seq(Seq(preds)))
    if (survivors.isEmpty)
      read().filter(lit(false)) // schema-only, zero splits read
    else spark.read.schema(m.schema).parquet(survivors.map(resolve): _*)
      .filter(ZoneMap.predicate(preds))
  }

  /** How many files a scan under `preds` would open — the observability
    * hook specs and callers use to assert pruning power without reading
    * any data.
    */
  def scanFileCount(preds: Seq[ZoneMap.Pred]): Long =
    pruneVersion(version, metaNow, Seq(Seq(preds)))._1.size.toLong

  /** The files a pruned scan of VERSION `v` must open (resolved), with
    * the total file count — the version-pinned planning primitive behind
    * the SQL read path ([[graft.sources.GraftTableSource]]), whose
    * relation is a snapshot of the version it loaded. The spec is a
    * [[ZoneMap.Cnf]] (AND across pushed filters, OR-groups inside), so
    * AND trees, OR trees and IN lists all prune: each OR-group keeps the
    * union of its disjuncts' survivors, groups compose by intersection.
    * Predicates on columns the table does not index are DROPPED here,
    * not refused — Catalyst pushes every comparison filter it sees, and
    * an unindexable check simply cannot prune; per-conjunct drops and
    * whole-group drops both WIDEN the read, and the engine's re-applied
    * residual keeps the result exact ([[scan]], the hand-held API,
    * still refuses loudly — a caller naming a pred explicitly should
    * learn it does nothing). An empty / fully-dropped spec skips
    * pruning (full manifest).
    */
  private[graft] def pruneFilesCnf(v: Long, cnf: ZoneMap.Cnf)
      : (Seq[String], Int) = {
    lazy val m = readMeta(spark, path, v)
    val usable = if (cnf.isEmpty) Nil else usableCnf(m, cnf)
    if (usable.isEmpty) {
      val all = storedFiles(v)
      (all.map(resolve), all.size)
    } else {
      // the pruning pass already carries every manifest row — the
      // total file count reads off it, no second manifest pass
      val (survivors, all) = pruneVersion(v, m, usable)
      (survivors.map(resolve), all.size)
    }
  }

  /** Drop what the version's index cannot check from a pruning spec —
    * per-conjunct pred drops and whole-group drops, each a widening.
    */
  private def usableCnf(m: Meta, cnf: ZoneMap.Cnf): ZoneMap.Cnf = {
    val zoned = m.zoneCols.toSet
    val bloomed = m.bloomCols.toSet
    def ok(p: ZoneMap.Pred): Boolean = p match {
      case ZoneMap.Range(c, _, _) => zoned(c)
      case ZoneMap.Point(c, _) => zoned(c) || bloomed(c)
      case ZoneMap.Nulls(c, _) => zoned(c)
    }
    cnf.map(dnf => dnf.map(_.filter(ok)))
      .filter(dnf => dnf.nonEmpty && dnf.forall(_.nonEmpty))
  }

  /** Schema of version `v` — for snapshot-pinned readers. */
  private[graft] def schemaAt(v: Long): StructType =
    readMeta(spark, path, v).schema

  /** Estimated (rows, bytes) of version `v` — one metadata read over
    * the manifest. Bytes are the REAL on-disk file sizes the manifest
    * records at publish ([[GraftTable.publishGeneration]]), scaled by
    * `spark.sql.sources.fileCompressionFactor` (the engine's own knob
    * for "parquet decompresses N×"), exactly how Spark's file sources
    * size themselves — never rows × schema width, which UNDER-estimates
    * string-heavy tables (StringType.defaultSize is 20 bytes) and a
    * too-small size broadcasts what should shuffle (driver OOM, the
    * unsafe direction). Manifest rows committed before the `bytes`
    * column fall back to rows × width for just those rows.
    *
    * This feeds `BaseRelation.sizeInBytes` (DSv1) and the V2 scan's
    * `SupportsReportStatistics`: without it Catalyst assumes
    * `defaultSizeInBytes` (≈ Long.Max) and a metadata-sized graft
    * dimension joined to a 100 TB fact would NEVER auto-broadcast.
    */
  /** A committed version's manifest is IMMUTABLE — its aggregate is
    * folded once PROCESS-WIDE (see [[GraftTable.statsCacheG]]): the
    * planner asks for table statistics several times per statement (size
    * estimate, row estimate, CBO), each ask was a manifest aggregate job,
    * and the SQL door opens a fresh handle per statement so a
    * handle-scoped memo re-paid it per statement. Two longs per version,
    * never persisted.
    */
  private[graft] def approxStats(v: Long): (Long, Long) = {
    val key = (rootNorm, v, commitToken(v))
    GraftTable.statsCacheG.get(key).getOrElse {
      GraftTable.boundCache(GraftTable.statsCacheG)
      GraftTable.statsCacheG.getOrElseUpdate(key, approxStatsUncached(v))
    }
  }

  /** Driver fold over the manifest snapshot — same algebra as the
    * former `sum(cnt), sum(coalesce(bytes, cnt*width))` aggregate, zero
    * Spark jobs.
    */
  private def approxStatsUncached(v: Long): (Long, Long) = {
    val (schema, rowsArr) = manifestSnap(v)
    val width = math.max(1, schemaAt(v).defaultSize)
    val cntIx = schema.fieldIndex("cnt")
    val bytesIx =
      if (schema.fieldNames.contains("bytes")) schema.fieldIndex("bytes")
      else -1
    var rows = 0L
    var raw = 0L
    rowsArr.foreach { r =>
      val c = if (r.isNullAt(cntIx)) 0L else r.getLong(cntIx)
      rows += c
      raw += (if (bytesIx >= 0 && !r.isNullAt(bytesIx)) r.getLong(bytesIx)
              else c * width.toLong)
    }
    val factor = scala.util.Try(spark.conf
      .get("spark.sql.sources.fileCompressionFactor", "1.0").toDouble)
      .getOrElse(1.0)
    val b = BigInt((raw * math.max(1.0, factor)).toLong)
    (rows, if (b > Long.MaxValue) Long.MaxValue else b.toLong)
  }

  private[graft] def approxBytes(v: Long): Long = approxStats(v)._2

  /** Per-ZONE-COLUMN plan statistics of version `v` — ONE metadata fold
    * over the manifest: global min/max from the per-file zone ranges,
    * null count from the per-file null counts (when the manifest
    * records them). Zero write-path cost — everything falls out of
    * statistics the manifest already carries; NDV derivation (bounded
    * by the integral value-range width) happens in the consumer. Feeds
    * the CBO-facing `CatalogTable` [[graft.plans.GraftV2ScanStats]]
    * synthesizes when `spark.sql.cbo.enabled` is on — per-column
    * min/max/null/NDV is what lets join reordering over three or more
    * graft tables estimate instead of guess.
    *
    * @return (column, min, max, nullCount; nullCount = -1 when the
    *         manifest predates per-file null counts)
    */
  private[graft] def columnStats(v: Long): Seq[(String, Any, Any, Long)] = {
    val m = readMeta(spark, path, v)
    val (schema, rowsArr) = manifestSnap(v)
    val have = schema.fieldNames.toSet
    val cols = m.zoneCols.filter(c => have(s"min_$c") && have(s"max_$c"))
    if (cols.isEmpty) return Nil
    // driver fold over the snapshot — min-of-mins / max-of-maxes /
    // sum-of-null-counts, null-skipping like the Spark aggregates it
    // replaces (zone values are Comparable: numerics, strings,
    // timestamps — the types [[ZoneMap]] indexes)
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    cols.map { c =>
      val mnIx = schema.fieldIndex(s"min_$c")
      val mxIx = schema.fieldIndex(s"max_$c")
      val nlIx = if (have(s"nulls_$c")) schema.fieldIndex(s"nulls_$c") else -1
      var mn: Any = null
      var mx: Any = null
      var nl = 0L
      var sawNl = false
      rowsArr.foreach { r =>
        if (!r.isNullAt(mnIx)) {
          val v0 = r.get(mnIx)
          if (mn == null || cmp(v0, mn) < 0) mn = v0
        }
        if (!r.isNullAt(mxIx)) {
          val v0 = r.get(mxIx)
          if (mx == null || cmp(v0, mx) > 0) mx = v0
        }
        if (nlIx >= 0 && !r.isNullAt(nlIx)) {
          nl += r.getAs[Number](nlIx).longValue(); sawNl = true
        }
      }
      (c, mn, mx, if (nlIx >= 0 && sawNl) nl else -1L)
    }
  }

  /** Fold a batch in under `batchId`: new data files + the union
    * manifest + the advanced ledger commit as one version. Ids at or
    * below the high-water mark no-op (at-least-once redelivery re-uses
    * its ORIGINAL id — the [[MaterializedAgg.MatAgg.update]] contract;
    * ids must be monotone per table, which micro-batch ids per
    * checkpoint lineage are).
    *
    * @return true if folded, false if skipped as already applied
    */
  def append(batch: DataFrame, batchId: Long): Boolean =
    appendImpl(batch, Some(batchId))

  /** Append body with OPTIMISTIC REBASE: an append reads nothing — its
    * manifest carry-forward re-resolves from whatever head it publishes
    * against — so losing a commit race to ANY winner (another append, a
    * merge, a compaction) is always a false conflict: re-attempt against
    * the new head. Two concurrent appenders therefore BOTH commit, at
    * contiguous versions, with the exact union of their rows. The one
    * true conflict left: an explicit-id append whose id the winner's
    * ledger already reached (same checkpoint lineage racing itself) —
    * silently skipping it as "redelivery" would drop rows, so it throws.
    * `batchId = None` (the manual form) re-ledgers at high-water + 1 on
    * every attempt.
    */
  private def appendImpl(batch: DataFrame, batchId: Option[Long]): Boolean = {
    var attempt = 0
    while (true) {
      val v = version
      try {
        val m = readMeta(spark, path, v)
        val id = batchId.getOrElse {
          requireManualLedgerAllowed(m, "append")
          m.appliedHwm + 1
        }
        if (id <= m.appliedHwm) {
          DedupIndex.log.warn(s"graft table $path: batch $id at or below " +
            s"the applied high-water mark ${m.appliedHwm} — redelivery (or a " +
            "non-monotone id, which violates the append contract) skipped")
          return false
        }
        val evolved = GraftTable.evolveSchema(m, batch.schema)
        publishGeneration(spark, path, batch, v + 1,
          m.copy(appliedHwm = id, schemaDdl = evolved.toDDL),
          // LAZY carry: the staging manifest write evaluates this read
          // while v is still retained (our own prune runs after the
          // commit rename). Under contention a racing winner's retention
          // prune can delete v's manifest dir mid-staging-write — that
          // surfaces as a raceArtifact this very catch rebases, so the
          // eager localCheckpoint job the pre-r18 shape paid per commit
          // defended nothing the retry loop doesn't already cover.
          carryForward = Some(manifestDf(v)),
          op = "append", carrySnap = carrySnapOf(v, m))
        return true
      } catch {
        case e: Throwable
            if e.isInstanceOf[java.util.ConcurrentModificationException] ||
              (GraftTable.raceArtifact(e) && version > v) =>
          attempt += 1
          val idCollides =
            batchId.exists(_ <= readMeta(spark, path, version).appliedHwm)
          if (attempt >= 10 || idCollides) throw e
          DedupIndex.log.info(s"graft table $path: append lost the " +
            s"v${v + 1} race — rebasing onto v$version (attempt $attempt)")
      }
    }
    sys.error("unreachable")
  }

  /** A streaming checkpoint that bootstrapped this table OWNS its
    * ledger: a manual `hwm + 1` stamp could advance the high-water mark
    * past the stream's next micro-batch id, which would then no-op as
    * "redelivery" — a silent batch drop. Refuse loudly instead.
    */
  private def requireManualLedgerAllowed(m: Meta, what: String): Unit =
    require(!m.streamed,
      s"graft table $path is stream-ledgered (bootstrapped by " +
        s"ingestStream/mergeStream): an unledgered $what would stamp " +
        s"hwm + 1 = ${m.appliedHwm + 1} and could overtake the live " +
        "checkpoint's next micro-batch id, silently no-op'ing that batch " +
        "as redelivery — route the mutation through the owning stream, " +
        "or use the (…, batchId) overload only with ids from that " +
        "checkpoint's lineage")

  /** Unledgered convenience append for manual (non-stream) callers:
    * ledger id = high-water + 1. REFUSED on a stream-ledgered table —
    * see [[requireManualLedgerAllowed]]; composing manual mutations with
    * a live checkpoint lineage is exactly the silent-batch-drop foot-gun.
    */
  def append(batch: DataFrame): Unit = { appendImpl(batch, None); () }

  /** Continuous ingest: one ledgered [[append]] per micro-batch through
    * the shared [[IndexStream]] harness — the micro-batch id IS the
    * ledger id, so foreachBatch redelivery lands at or below the
    * high-water mark and no-ops: file-level exactly-once, unlike the
    * at-least-once raw-directory sink [[ZoneMap.ingestStream]] documents.
    */
  def ingestStream(rows: DataFrame, checkpointDir: String): Unit =
    IndexStream.runIndexed(rows, checkpointDir)(
      (batch, id) => { append(batch, id); () })

  /** MERGE (latest-wins upsert + row-level DELETE) at FILE granularity:
    * delete every stored row whose `keyCol` appears in `batch`, insert
    * the batch's NON-tombstone rows, and commit the result as one
    * version — rewriting ONLY the files whose zone [min, max] on
    * `keyCol` can contain a batch key. Every other file's manifest row
    * carries forward untouched, so merge cost scales with the AFFECTED
    * files, not the corpus — on a key-clustered 100 TB table a change
    * batch touches its key range's files and nothing else (the
    * pruned-rewrite idea behind the public formats' MERGE INTO).
    *
    * With `opCol` non-null, rows whose op equals [[GraftTable.DeleteOp]]
    * are TOMBSTONES (the [[Ingest.applyChanges]] convention): their keys
    * delete without re-insert, so a CDC stream's deletes apply as
    * deletes. `opCol` is consumed here and never stored. Tombstone rows
    * must still carry the indexed columns (the batch schema is one
    * schema; change streams ship key + image anyway).
    *
    * Selection is conservative-by-construction: a file is skipped only
    * when its zone range provably excludes every batch key (all-null
    * zone rows exclude all non-null keys), decided by one broadcast join
    * of the metadata-scale manifest against the batch — batch keys never
    * visit the driver.
    *
    * Contract: `keyCol` must be zone-indexed; batch keys must be
    * non-null and unique within the batch (ONE aggregate answers both —
    * this runs per micro-batch on [[mergeStream]]'s hot path; a
    * duplicated key would make "latest wins" order-dependent inside one
    * commit, and a same-batch delete+upsert of one key is ambiguous).
    * Ledgered like [[append]]: a redelivered merge no-ops.
    *
    * @return (files rewritten, files carried forward untouched)
    */
  def merge(batch: DataFrame, keyCol: String, batchId: Long,
      opCol: String): (Long, Long) =
    mergeImpl(batch, Seq(keyCol), Some(batchId), opCol, None)

  /** COMPOSITE-key [[merge]] (CDC business keys are often multi-column):
    * the key is the column TUPLE — deletes/upserts match on every
    * component — while file pruning rides the LEADING key's zone range
    * (and bloom), so make it the table's clustering axis. The leading
    * key must be zone-indexed; the batch-key contract (non-null, unique)
    * applies to the tuple.
    */
  def merge(batch: DataFrame, keyCols: Seq[String], batchId: Long,
      opCol: String): (Long, Long) =
    mergeImpl(batch, keyCols, Some(batchId), opCol, None)

  /** Manual-ledger composite-key [[merge]] with an op column. */
  def merge(batch: DataFrame, keyCols: Seq[String],
      opCol: String): (Long, Long) =
    mergeImpl(batch, keyCols, None, opCol, None)

  /** Conditional / partial-column MERGE (the public formats' WHEN MATCHED
    * AND … THEN UPDATE SET …): like [[merge]] but a MATCHED pair updates
    * only when `matchedCond` holds — written against the aliases `t`
    * (the stored row) and `s` (the batch row), e.g.
    * `col("s.ts") > col("t.ts")` — and the update writes ONLY
    * `updateCols` from the batch, preserving every other stored column
    * (`Nil` = every batch column updates; columns the batch doesn't
    * carry are ALWAYS preserved — SQL UPDATE SET semantics, unlike
    * [[merge]]'s whole-row replacement). A matched pair failing the
    * condition carries the stored row UNCHANGED (and feeds nothing to
    * the change feed); an unmatched batch row INSERTS unconditionally
    * (missing table columns null); with `opCol`, [[DeleteOp]] rows
    * tombstone unconditionally. Duplicate stored keys each update
    * independently (SQL UPDATE semantics; [[merge]]'s upsert instead
    * collapses them — the two operations differ by design).
    *
    * File pruning, the persisted row-level change slice, the ledger, the
    * batch-key contract and the optimistic rebase are all [[merge]]'s.
    */
  def mergeCond(batch: DataFrame, keyCol: String, matchedCond: Column,
      updateCols: Seq[String], opCol: String, batchId: Long): (Long, Long) =
    mergeImpl(batch, Seq(keyCol), Some(batchId), opCol,
      Some(GraftTable.MergeSpec(update = Some(matchedCond),
        updateCols = updateCols, insert = Some(lit(true)))))

  /** Manual-ledger [[mergeCond]] (id = high-water + 1, refused on a
    * stream-ledgered table).
    */
  def mergeCond(batch: DataFrame, keyCol: String, matchedCond: Column,
      updateCols: Seq[String] = Nil, opCol: String = null): (Long, Long) =
    mergeImpl(batch, Seq(keyCol), None, opCol,
      Some(GraftTable.MergeSpec(update = Some(matchedCond),
        updateCols = updateCols, insert = Some(lit(true)))))

  /** COMPOSITE-key manual-ledger [[mergeCond]] — match on the column
    * tuple, prune on the leading key (see the composite [[merge]]).
    */
  def mergeCond(batch: DataFrame, keyCols: Seq[String], matchedCond: Column,
      updateCols: Seq[String], opCol: String): (Long, Long) =
    mergeImpl(batch, keyCols, None, opCol,
      Some(GraftTable.MergeSpec(update = Some(matchedCond),
        updateCols = updateCols, insert = Some(lit(true)))))

  /** Multi-wing MERGE per `spec` ([[GraftTable.MergeSpec]]'s clause
    * algebra: conditional matched DELETE + matched UPDATE with
    * target-referencing SET expressions + conditional NOT MATCHED
    * INSERT, first-match-wins), composite keys matching on the tuple and
    * pruning on the leading key. Manual ledger (id = high-water + 1,
    * refused on a stream-ledgered table); file pruning, the change
    * slice, the batch-key contract and the optimistic rebase are all
    * [[merge]]'s. `spec.opCol` rows equal to [[GraftTable.DeleteOp]]
    * tombstone unconditionally.
    */
  def mergeSpec(batch: DataFrame, keyCols: Seq[String],
      spec: GraftTable.MergeSpec): (Long, Long) =
    mergeImpl(batch, keyCols, None, spec.opCol, Some(spec))

  private val ChangeType = "_change_type"

  /** Align `df` to the slice schema (`schema` + `_change_type`): missing
    * columns null, extras dropped — the one shape every change-slice leg
    * unions into.
    */
  private def alignSlice(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select((schema.fields.map(f =>
      if (have(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)) :+ col(ChangeType)): _*)
  }

  /** The shared engine behind [[merge]] and [[mergeCond]].
    *
    * `batchId = None` is the manual-ledger form: the id is recomputed as
    * high-water + 1 on EVERY attempt, so an optimistic rebase after a
    * lost race re-ledgers against the new head instead of colliding.
    *
    * OPTIMISTIC REBASE (the Delta/Iceberg retry discipline): when the
    * publish loses a commit race, the merge re-attempts against the new
    * head iff it is provably serializable after the winner — the files
    * this attempt planned to rewrite are all still referenced (the
    * winner's rewrite-set is disjoint from this read-set) and, for an
    * explicit-id merge, the winner did not advance the ledger past this
    * batch's id. A true overlap (two merges on the same key stripe, a
    * concurrent compaction) still throws
    * `ConcurrentModificationException` — rebase never papers over a
    * genuine conflict, it only removes the false ones. The re-attempt
    * recomputes EVERYTHING (affected set, carried manifest, schema
    * evolution) from the new head, so winner-added files that contain
    * batch keys are rewritten correctly.
    */
  private def mergeImpl(batch: DataFrame, keyCols: Seq[String],
      batchId: Option[Long], opCol: String,
      spec: Option[GraftTable.MergeSpec]): (Long, Long) = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(keyCols.distinct.size == keyCols.size,
      s"duplicate merge key columns: ${keyCols.mkString(", ")}")
    if (opCol != null)
      require(batch.columns.contains(opCol),
        s"merge op column $opCol is not in the batch: ${batch.columns.mkString(", ")}")
    val carryCols = spec.map(_.carryCols).getOrElse(Nil)
    require(carryCols.forall(batch.columns.contains),
      s"carryCols must exist in the batch: " +
        s"${carryCols.filterNot(batch.columns.contains).mkString(", ")}")
    require(spec.forall(_.updateCols.forall(batch.columns.contains)),
      s"updateCols must exist in the batch: " +
        s"${spec.map(_.updateCols.filterNot(batch.columns.contains))
          .getOrElse(Nil).mkString(", ")}")
    // the PRUNING axis: file candidacy rides the leading key's zone
    // range (and bloom) — trailing key components only join, composite
    // pruning would multiply manifest columns for little extra power
    val keyCol = keyCols.head
    // cache the batch ONCE (the Delta merge-source discipline): the
    // contract aggregate, the pruning join, the merge join and every
    // change-slice leg all re-evaluate the batch plan otherwise — for a
    // CDC batch built from scans+unions that is 4-6 full re-executions
    // per commit. LAZY persist, not an eager checkpoint: no extra job —
    // the contract aggregate (the first consumer) populates the cache in
    // the pass it pays anyway; O(batch) rows in spillable storage,
    // released explicitly after the commit.
    val batch0 = batch.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val batchRows = requireMergeContract(batch0, keyCols)
    // null-safe: a NULL op is "any other value", i.e. an upsert — a bare
    // =!= would evaluate to null and silently drop the row while its key
    // still tombstoned through the delete set
    val isDel =
      if (opCol == null) lit(false) else col(opCol) <=> lit(DeleteOp)
    val keys = batch0.select(keyCols.map(col): _*)
    var attempt = 0
    while (true) {
      val v = version
      val m = readMeta(spark, path, v)
      require(m.zoneCols.contains(keyCol),
        s"the leading merge key $keyCol must be zone-indexed " +
          s"(zones: ${m.zoneCols.mkString(", ")})")
      val id = batchId.getOrElse {
        requireManualLedgerAllowed(m, "merge")
        m.appliedHwm + 1
      }
      if (id <= m.appliedHwm) {
        DedupIndex.log.warn(s"graft table $path: merge batch $id at or " +
          s"below the applied high-water mark ${m.appliedHwm} — redelivery " +
          "(or a non-monotone id) skipped")
        return (0L, 0L)
      }
      val manifest = manifestDf(v)
      // a file is affected iff SOME batch key — upsert or tombstone —
      // falls inside its zone range. The candidacy probe keeps batch
      // keys executor-side; the manifest side rides into the plan as a
      // LITERAL range array off the per-version snapshot when it fits
      // (one narrow job, no broadcast-exchange build job), and falls
      // back to the broadcast join beyond the literal cap (a 100 TB
      // manifest belongs in an exchange, not an expression tree). Files
      // whose zone range is all-null exclude every non-null batch key —
      // the join semantics — so they drop from the literal up front.
      val (snapSchema, snapRows) = manifestSnap(v)
      val ranges: Seq[(String, Any, Any)] = {
        val fIx = snapSchema.fieldIndex("file")
        val mnIx = snapSchema.fieldIndex(s"min_$keyCol")
        val mxIx = snapSchema.fieldIndex(s"max_$keyCol")
        snapRows.toSeq.collect {
          case r if !r.isNullAt(mnIx) && !r.isNullAt(mxIx) =>
            (r.getString(fIx), r.get(mnIx), r.get(mxIx))
        }
      }
      val litRanges: Option[Column] =
        if (ranges.isEmpty || ranges.size > 4096) None
        else scala.util.Try(array(ranges.map { case (f, mn, mx) =>
          struct(lit(f).as("f"), lit(mn).as("mn"), lit(mx).as("mx"))
        }: _*)).toOption
      def rangeCand = litRanges match {
        case Some(arr) =>
          keys.select(explode(filter(arr, r =>
              col(keyCol) >= r.getField("mn") &&
                col(keyCol) <= r.getField("mx"))).as("_r"))
            .select(col("_r.f").as("file")).distinct()
        case None =>
          keys.join(
              broadcast(manifest.select(col("file"),
                col(s"min_$keyCol").as("_mn"), col(s"max_$keyCol").as("_mx"))),
              col(keyCol) >= col("_mn") && col(keyCol) <= col("_mx"))
            .select("file").distinct()
      }
      // …tightened by the per-file manifest blooms when the key column
      // carries them: on a hash-scattered layout every file spans the
      // full key range (min/max prunes nothing) but contains only its
      // own keys, so the bloom shrinks the rewrite set to the files that
      // might actually hold a batch key. No false negatives ⇒ exact.
      // Distinct key hashes ride as ONE array row (executor-side, never
      // the driver), each candidate file's bloom deserializes once;
      // capped so a giant batch can't fold into a single fat row.
      val affected = GraftTable.labeled(spark, s"graft:merge:affected v$v") {
        GraftTable.withoutAqe(spark) {
        if (ranges.isEmpty && litRanges.isEmpty && snapRows.nonEmpty)
          Set.empty[String] // every zone range is null: nothing can match
        else if (snapRows.isEmpty) Set.empty[String]
        else if (!m.bloomCols.contains(keyCol) || batchRows > 5000000L)
          rangeCand.collect().map(_.getString(0)).toSet
        else {
          val anyHit = udf((bytes: Array[Byte], hs: Seq[Long]) =>
            bytes != null && {
              val bf = org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(bytes))
              hs.exists(bf.mightContainLong)
            })
          val khs = keys
            .select(ZoneMap.bloomHash(col(keyCol)).as("_kh")).distinct()
            .agg(collect_list("_kh").as("_khs"))
          manifest.join(rangeCand, Seq("file"), "left_semi")
            .select(col("file"), col(s"bloom_$keyCol").as("_bl"))
            .crossJoin(khs)
            .filter(anyHit(col("_bl"), col("_khs")))
            .select("file").collect().map(_.getString(0)).toSet
        }
        }
      }
      // LAZY carry (the appendImpl discipline): evaluated by the staging
      // manifest write while v is still retained; a racing winner's prune
      // surfaces as a raceArtifact the rebase catch below retries. The
      // carried COUNT is set arithmetic over the cached file list —
      // affected ⊆ stored by construction — not a Spark job.
      val carried = manifest.filter(!col("file").isInCollection(affected))
      val carriedCount = storedFiles(v).size.toLong - affected.size
      val evolved = GraftTable.evolveSchema(m,
        StructType(batch.schema.filterNot(f =>
          f.name == opCol || carryCols.contains(f.name))))
      val sliceSchema = evolved
      // feed ON: the affected stripe is read by the rewrite AND by every
      // change-slice leg (2-4 more evaluations) — cache it once
      // (lazily: the rewrite's own pass populates it, no extra job),
      // spillable storage proportional to the rewrite the commit pays
      // anyway, released after the commit. Feed OFF: the slice never
      // executes, so the single lazy read stays the cheapest plan.
      val stored =
        if (affected.isEmpty) None
        else {
          val st = spark.read.schema(evolved)
            .parquet(affected.toSeq.map(resolve): _*)
          Some(if (m.changeFeed) st.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else st)
        }
      val (rewrittenRows, slice, sliceCleanup) = spec match {
        case None =>
          classicMerge(batch0, keyCols, isDel, opCol, stored, sliceSchema,
            m.changeFeed)
        case Some(sp) =>
          condMerge(batch0, keyCols, isDel, opCol, sp, stored, evolved,
            sliceSchema, m.changeFeed)
      }
      try {
        publishGeneration(spark, path, rewrittenRows, v + 1,
          m.copy(appliedHwm = id, schemaDdl = evolved.toDDL),
          carryForward = Some(carried), changes = Some(slice),
          op = "merge", carrySnap = carrySnapOf(v, m, affected))
        return (affected.size.toLong, carriedCount)
      } catch {
        case e: Throwable
            if e.isInstanceOf[java.util.ConcurrentModificationException] ||
              (GraftTable.raceArtifact(e) && version > v) =>
          attempt += 1
          val head = version
          // base version pruned by the winner's retention → this
          // attempt's read-set cannot be proven disjoint: conservative,
          // the conflict surfaces (widen keepVersions to rebase merges
          // under heavy contention)
          val removed =
            try storedFiles(v).toSet -- storedFiles(head).toSet
            catch { case _: Throwable => throw e }
          val headHwm = readMeta(spark, path, head).appliedHwm
          val idCollides = batchId.exists(_ <= headHwm)
          if (attempt >= 10 || idCollides || affected.exists(removed))
            throw e
          DedupIndex.log.info(s"graft table $path: merge lost the v${v + 1} " +
            s"race but is disjoint from the winner — rebasing onto v$head " +
            s"(attempt $attempt)")
      } finally {
        sliceCleanup()
        stored.foreach(_.unpersist(false))
      }
    }
    } finally batch0.unpersist(false)
    sys.error("unreachable")
  }

  /** [[merge]]'s latest-wins upsert body: delete every stored row whose
    * key appears in the batch, insert the non-tombstone batch rows.
    * Returns (rewritten rows, row-level change slice).
    */
  private def classicMerge(batch: DataFrame, keyCols: Seq[String],
      isDel: Column, opCol: String, stored: Option[DataFrame],
      sliceSchema: StructType, changeFeed: Boolean)
      : (DataFrame, DataFrame, () => Unit) = {
    val keys = batch.select(keyCols.map(col): _*)
    val upserts = (if (opCol == null) batch else batch.filter(!isDel)
      .drop(opCol))
    val rewritten = stored match {
      case None => upserts
      case Some(st) => st.join(keys, keyCols, "left_anti")
        .unionByName(upserts, allowMissingColumns = true)
    }
    // the row-level change slice the merge computes anyway: stored rows
    // whose key the batch touches are the pre-images (delete for
    // tombstoned keys, update_preimage otherwise); batch upserts are the
    // post-images (update_postimage when a pre-image exists, insert when
    // the key is new). O(batch + matched stored rows), never O(file).
    val keyOps = batch.select(keyCols.map(col) :+ isDel.as("_del"): _*)
    val slice = stored match {
      case None =>
        alignSlice(upserts.withColumn(ChangeType, lit("insert")), sliceSchema)
      case Some(st) =>
        val pre = st.join(keyOps, keyCols, "inner")
          .withColumn(ChangeType,
            when(col("_del"), lit("delete")).otherwise(lit("update_preimage")))
        val existed = st.join(keys, keyCols, "left_semi")
          .select(keyCols.map(col): _*).distinct()
          .withColumn("_ex", lit(true))
        val post = upserts.join(existed, keyCols, "left")
          .withColumn(ChangeType,
            when(col("_ex"), lit("update_postimage")).otherwise(lit("insert")))
        alignSlice(pre, sliceSchema)
          .unionByName(alignSlice(post, sliceSchema))
    }
    (rewritten, slice, () => ())
  }

  /** [[mergeCond]]/[[mergeSpec]]'s SQL-MERGE body over one full-outer
    * join of the affected files (`t`) with the batch (`s`): every wing
    * condition ([[GraftTable.MergeSpec]]) evaluates row-level on that
    * join — no extra table reads, first-match-wins between the matched
    * DELETE and UPDATE wings per `deleteFirst`. Returns
    * (rewritten rows, row-level change slice).
    */
  private def condMerge(batch: DataFrame, keyCols: Seq[String],
      isDel: Column, opCol: String, spec: GraftTable.MergeSpec,
      stored: Option[DataFrame], evolved: StructType,
      sliceSchema: StructType, changeFeed: Boolean)
      : (DataFrame, DataFrame, () => Unit) = {
    val keyCol = keyCols.head
    val s0 = batch.withColumn("_del", isDel)
    val sBatch = (if (opCol == null) s0 else s0.drop(opCol)).alias("s")
    // columns the batch can STORE: carry-only columns are visible to the
    // t/s expressions below but never insert and never evolve the schema
    val batchCols = batch.columns
      .filterNot(c => c == opCol || spec.carryCols.contains(c)).toSet
    val exprFor = spec.updateExprs.toMap
    val updateSet =
      if (spec.updateCols.nonEmpty || exprFor.nonEmpty)
        (spec.updateCols ++ exprFor.keys).toSet
      else batchCols -- keyCols
    def sCol(c: String) =
      if (batchCols(c)) col(s"s.$c")
      else lit(null).cast(evolved(c).dataType)
    // a condition-passing update writes the wing's own t/s expression for
    // exprFor columns (cast to the stored type, SQL UPDATE semantics) and
    // the batch value for the rest of updateSet
    def updVal(c: String) =
      exprFor.get(c).map(_.cast(evolved(c).dataType)).getOrElse(sCol(c))
    val insOk = spec.insert.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))
    val uc = spec.update.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))
    val dc = spec.delete.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))
    stored match {
      case None =>
        val ins = sBatch.filter(!col("_del") && insOk)
        val img = ins.select(evolved.fieldNames.map(c => sCol(c).as(c)): _*)
        (img, alignSlice(img.withColumn(ChangeType, lit("insert")),
          sliceSchema), () => ())
      case Some(st) =>
        val joined = st.alias("t").join(sBatch,
          keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _),
          "full_outer")
        // key components are non-null per contract (stored side: they
        // were merged in under it; batch side: requireMergeContract), so
        // the leading component's null-ness identifies the join wing
        val matched = col(s"t.$keyCol").isNotNull && col(s"s.$keyCol").isNotNull
        val sOnly = col(s"t.$keyCol").isNull
        // first-match-wins between the matched wings: the clause written
        // first claims a row passing both conditions; opCol tombstones
        // ride the delete wing unconditionally (the merge() convention)
        val doDelete = matched && (col("_del") ||
          (!col("_del") && (if (spec.deleteFirst) dc else !uc && dc)))
        val doUpdate = matched && !col("_del") &&
          (if (spec.deleteFirst) !dc && uc else uc)
        val doInsert = sOnly && !col("_del") && insOk
        // per-column final image: insert rows take the batch value,
        // condition-passing updates take the wing's value for updateSet
        // columns, everything else (including matched rows no wing
        // claims) preserves the stored value
        val rewritten = joined.filter(!doDelete && !(sOnly && !doInsert))
          .select(evolved.fieldNames.map { c =>
            val out =
              if (keyCols.contains(c)) coalesce(col(s"t.$c"), col(s"s.$c"))
              else when(doInsert, sCol(c))
                .when(doUpdate && lit(updateSet(c)), updVal(c))
                .otherwise(col(s"t.$c"))
            out.as(c)
          }: _*)
        def sliceStruct(tpe: String, img: String => Column): Column =
          struct((evolved.fieldNames.map(c => img(c).as(c)) :+
            lit(tpe).as(ChangeType)): _*)
        val tImg = (c: String) => col(s"t.$c")
        val postImg = (c: String) =>
          if (keyCols.contains(c)) col(s"t.$c")
          else if (updateSet(c)) updVal(c) else col(s"t.$c")
        // the WHOLE slice in one pass over ONE evaluation of the join
        // instead of a 4-leg union re-executing it per change type: each
        // joined row contributes its 0-2 slice rows (an update emits its
        // pre+post pair) — same rows, one evaluation, one write job
        val slice = joined.select(explode(array_compact(array(
            when(doDelete, sliceStruct("delete", tImg)),
            when(doUpdate, sliceStruct("update_preimage", tImg)),
            when(doUpdate, sliceStruct("update_postimage", postImg)),
            when(doInsert, sliceStruct("insert", sCol))))).as("_r"))
          .select((evolved.fieldNames.map(c => col(s"_r.$c")) :+
            col(s"_r.$ChangeType")): _*)
        (rewritten, slice, () => ())
    }
  }

  /** Upsert-only [[merge]] (no op column). */
  def merge(batch: DataFrame, keyCol: String, batchId: Long): (Long, Long) =
    merge(batch, keyCol, batchId, null)

  /** [[merge]] with ledger id = high-water + 1, for manual callers —
    * refused on a stream-ledgered table ([[requireManualLedgerAllowed]]);
    * the id is re-resolved on every rebase attempt, so two concurrent
    * manual mergers of DISJOINT stripes both commit.
    */
  def merge(batch: DataFrame, keyCol: String): (Long, Long) =
    mergeImpl(batch, Seq(keyCol), None, null, None)

  /** Manual [[merge]] with an op column ([[GraftTable.DeleteOp]] rows
    * tombstone); ledger id = high-water + 1, refused on a
    * stream-ledgered table.
    */
  def merge(batch: DataFrame, keyCol: String, opCol: String): (Long, Long) =
    mergeImpl(batch, Seq(keyCol), None, opCol, None)

  /** Predicate DELETE (the `DELETE FROM t WHERE …` shape): remove every
    * row satisfying `ZoneMap.predicate(preds) && extra`, rewriting ONLY
    * the files zone/bloom pruning says might hold one — `preds` drives
    * the (conservative, exact) file pruning, `extra` is an arbitrary
    * residual over the table's columns applied inside the surviving
    * files. A DML that matches no file is a NO-OP: no version commits
    * (nothing changed, the feed carries nothing). The deleted rows
    * persist as the commit's row-level change slice (`delete`), so the
    * change feed serves O(deleted), never file churn. Not ledgered —
    * the batch-id high-water mark is untouched, so predicate DML
    * composes with a live `mergeStream` the way compaction does.
    * Commit races rebase like [[merge]]: retry against the new head iff
    * the winner's rewrite set is disjoint from this DML's.
    *
    * NULL semantics are SQL DELETE's: a row where the predicate is NULL
    * is NOT deleted.
    *
    * @return (files rewritten, files carried untouched)
    */
  def delete(preds: Seq[ZoneMap.Pred], extra: Column = lit(true))
      : (Long, Long) = {
    require(preds.nonEmpty,
      "predicate DML needs at least one pruning predicate — use " +
        "Range(col) with one-sided bounds for a broad condition")
    val r = dmlImpl(preds.map(p => Seq(Seq(p))),
      ZoneMap.predicate(preds) && extra, None, filterUsable = false)
    (r.filesRewritten, r.filesCarried)
  }

  /** Predicate UPDATE (the `UPDATE t SET … WHERE …` shape): for every
    * row satisfying `ZoneMap.predicate(preds) && extra`, replace each
    * `set` column with its expression (evaluated against the row's
    * CURRENT values, all columns addressable; cast to the column's
    * stored type — DML never changes the schema); all other rows and
    * columns ride through unchanged. File pruning, the no-match no-op,
    * ledger neutrality, and race rebase are [[delete]]'s; the commit's
    * change slice is the exact `update_preimage`/`update_postimage`
    * pair set. Updating a zone or bloom column is safe — the rewritten
    * generation re-indexes.
    *
    * @return (files rewritten, files carried untouched)
    */
  def update(preds: Seq[ZoneMap.Pred], set: Map[String, Column],
      extra: Column = lit(true)): (Long, Long) = {
    require(preds.nonEmpty,
      "predicate DML needs at least one pruning predicate — use " +
        "Range(col) with one-sided bounds for a broad condition")
    require(set.nonEmpty, "update needs at least one SET column")
    val r = dmlImpl(preds.map(p => Seq(Seq(p))),
      ZoneMap.predicate(preds) && extra, Some(set), filterUsable = false)
    (r.filesRewritten, r.filesCarried)
  }


  /** The SQL front door's DML body ([[graft.plans]] routes `DELETE
    * FROM`/`UPDATE` here): `preds` is best-effort pruning ONLY — preds
    * on non-indexed columns are dropped, an empty survivor set means a
    * full-manifest rewrite candidacy — and `extra` carries the EXACT
    * SQL condition, so correctness never depends on what pruned (the
    * [[graft.sources.GraftTableSource]] discipline). The hand-held
    * [[delete]]/[[update]] keep their loud non-empty/indexed contract.
    */
  private[graft] def dmlWhere(preds: Seq[ZoneMap.Pred], extra: Column,
      set: Option[Map[String, Column]]): DmlResult =
    dmlWhereCnf(preds.map(p => Seq(Seq(p))), extra, set)

  /** [[dmlWhere]] with a [[ZoneMap.Cnf]] pruning spec — the SQL door's
    * OR/IN trees prune per-disjunct and union ([[pruneFilesCnf]]'s
    * algebra); `extra` stays the one EXACT condition.
    */
  private[graft] def dmlWhereCnf(cnf: ZoneMap.Cnf, extra: Column,
      set: Option[Map[String, Column]]): DmlResult =
    dmlImpl(cnf, extra, set, filterUsable = true)

  /** @param cnf pruning spec ONLY (file candidacy, conservative)
    * @param extra the EXACT row condition — correctness never depends
    *              on what pruned
    * @param filterUsable drop non-indexed preds from `cnf` (the SQL
    *                     door's forgiving contract) instead of letting
    *                     the zone check refuse loudly (the hand-held
    *                     [[delete]]/[[update]] contract)
    */
  private def dmlImpl(cnf: ZoneMap.Cnf, extra: Column,
      set: Option[Map[String, Column]], filterUsable: Boolean): DmlResult = {
    var attempt = 0
    while (true) {
      val v = version
      val m = readMeta(spark, path, v)
      set.foreach { s =>
        val bad = s.keySet -- m.schema.fieldNames.toSet
        require(bad.isEmpty,
          s"SET columns not in the table schema: ${bad.mkString(", ")}")
      }
      val manifest = manifestDf(v)
      val usable = if (filterUsable) usableCnf(m, cnf) else cnf
      val affected =
        if (usable.isEmpty) storedFiles(v).toSet
        else pruneVersion(v, m, usable)._1.toSet
      if (affected.isEmpty) return DmlResult(0L, storedFiles(v).size.toLong, 0L)
      // LAZY carry + arithmetic count — the mergeImpl discipline
      val carried = manifest.filter(!col("file").isInCollection(affected))
      val carriedCount = storedFiles(v).size.toLong - affected.size
      val cond = coalesce(extra, lit(false))
      // the stripe feeds the row gate, the rewrite AND (feed on) the
      // change slice — 2-3 evaluations; a LAZY persist lets the gate's
      // count populate the cache in the pass it pays anyway (no extra
      // job) and the later consumers read it back. Released per attempt.
      val stored = spark.read.schema(m.schema)
        .parquet(affected.toSeq.map(resolve): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
      val (rewritten, slice) = set match {
        case None =>
          (stored.filter(!cond),
            alignSlice(stored.filter(cond)
              .withColumn(ChangeType, lit("delete")), m.schema))
        case Some(sets) =>
          def image(of: DataFrame, updated: Column) =
            of.select(m.schema.fieldNames.map { c =>
              (sets.get(c) match {
                case Some(e) => when(updated, e.cast(m.schema(c).dataType))
                  .otherwise(col(c))
                case None => col(c)
              }).as(c)
            }: _*)
          val pre = stored.filter(cond)
          (image(stored, cond),
            alignSlice(pre.withColumn(ChangeType, lit("update_preimage")),
                m.schema)
              .unionByName(alignSlice(image(pre, lit(true))
                .withColumn(ChangeType, lit("update_postimage")), m.schema)))
      }
      // ROW-level no-op gate, not just file-level: zone pruning is
      // conservative (a strict bound widens, a bloom false-positives),
      // so "some file survived pruning" does not mean "some row
      // matches" — and committing an identical rewrite of a 100 GB
      // stripe because k < 0 could not rule out the min_k = 0 file is
      // exactly the pointless I/O the manifest exists to avoid. The gate
      // is one COUNT of the matching rows (over the feed-ON path's
      // materialized stripe, so it costs a cache pass, not a re-scan),
      // which doubles as the exact rows-affected report; the slice stays
      // LAZY — feed ON, the `_changes` write inside the commit evaluates
      // it once from the same materialized stripe, feed OFF it never
      // runs at all.
      val matchedRows = stored.filter(cond).count()
      val changesOpt = if (m.changeFeed) Some(slice) else None
      if (matchedRows == 0L)
        return DmlResult(0L, storedFiles(v).size.toLong, 0L)
      try {
        publishGeneration(spark, path, rewritten, v + 1, m,
          carryForward = Some(carried), changes = changesOpt,
          op = if (set.isDefined) "update" else "delete",
          carrySnap = carrySnapOf(v, m, affected))
        return DmlResult(affected.size.toLong, carriedCount, matchedRows)
      } catch {
        case e: Throwable
            if e.isInstanceOf[java.util.ConcurrentModificationException] ||
              (GraftTable.raceArtifact(e) && version > v) =>
          attempt += 1
          val head = version
          val removed =
            try storedFiles(v).toSet -- storedFiles(head).toSet
            catch { case _: Throwable => throw e }
          if (attempt >= 10 || affected.exists(removed)) throw e
          DedupIndex.log.info(s"graft table $path: DML lost the v${v + 1} " +
            s"race but is disjoint from the winner — rebasing onto v$head " +
            s"(attempt $attempt)")
      }
      } finally stored.unpersist(false)
    }
    sys.error("unreachable")
  }

  /** Change the table's lifecycle POLICIES — retention (`keepVersions`,
    * `keepHours`), change-feed persistence (`changeFeed`) — as ONE
    * metadata-only commit: the new version carries the whole manifest
    * forward (zero data files move) and only meta differs, so the
    * switch is atomic and time-travel-consistent like every other
    * mutation (the ALTER TABLE SET TBLPROPERTIES shape). Allowed on
    * stream-ledgered tables — the ledger is untouched. The new
    * retention applies from THIS commit's prune onward.
    */
  def setPolicies(keepVersions: Option[Int] = None,
      keepHours: Option[Double] = None,
      changeFeed: Option[Boolean] = None): Unit = {
    require(keepVersions.forall(_ >= 1),
      s"keepVersions must be >= 1: $keepVersions")
    val v = version
    val m = readMeta(spark, path, v)
    val nm = m.copy(
      keepVersions = keepVersions.getOrElse(m.keepVersions),
      keepHours = keepHours.getOrElse(m.keepHours),
      changeFeed = changeFeed.getOrElse(m.changeFeed))
    if (nm == m) return
    publishGeneration(spark, path,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema),
      v + 1, nm,
      carryForward = Some(manifestDf(v)),
      changesEmpty = true, op = "setpolicy", carrySnap = carrySnapOf(v, m))
  }

  /** `ALTER TABLE … ADD COLUMN` — ADDITIVE schema evolution declared by
    * DDL instead of a write: ONE metadata-only commit widens the stored
    * schema by `cols` (forced nullable — rows written before the
    * evolution read NULL, exactly the contract when a wider append
    * evolves the schema), the whole manifest carries forward, zero data
    * files move. Re-declaring an existing column with the SAME type is
    * a no-op (idempotent migrations); a differing type refuses —
    * parquet files cannot re-type. Allowed on stream-ledgered tables —
    * the ledger is untouched.
    */
  def addColumns(cols: StructType): Unit = {
    require(cols.nonEmpty, "ADD COLUMN needs at least one column")
    val v = version
    val m = readMeta(spark, path, v)
    val stored = m.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { f =>
      stored.get(f.name).foreach { dt =>
        require(dt == f.dataType, s"column ${f.name} already exists " +
          s"with type ${dt.sql} — parquet files cannot re-type " +
          s"(ADD COLUMN declared ${f.dataType.sql})")
      }
    }
    val fresh = cols.fields.filterNot(f => stored.contains(f.name))
      .map(_.copy(nullable = true))
    if (fresh.isEmpty) return
    val evolved = StructType(m.schema.fields ++ fresh)
    publishGeneration(spark, path,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evolved),
      v + 1, m.copy(schemaDdl = evolved.toDDL),
      carryForward = Some(manifestDf(v)),
      changesEmpty = true, op = "addcolumns", carrySnap = carrySnapOf(v, m))
  }

  /** The table's current lifecycle policies:
    * (keepVersions, keepHours, changeFeed).
    */
  def policies(): (Int, Double, Boolean) = {
    val m = metaNow
    (m.keepVersions, m.keepHours, m.changeFeed)
  }

  /** The manifest's index geometry: (zone columns, bloom columns). */
  def indexedCols(): (Seq[String], Seq[String]) = {
    val m = metaNow
    (m.zoneCols, m.bloomCols)
  }

  /** Row-level CHANGE FEED between two committed versions — Delta CDF
    * semantics, served at ROW granularity whenever the commit persisted
    * its change slice and at FILE granularity otherwise:
    *
    *  - a commit that wrote `v{w}/_changes` ([[merge]]/[[mergeCond]]
    *    persist the exact insert / delete / update_preimage /
    *    update_postimage slice they compute anyway; [[compact]]/
    *    [[zorder]] persist an EMPTY slice — a pure relayout changes no
    *    rows and feeds NOTHING) serves that slice verbatim, stamped
    *    `_commit_version = w`. A k-key merge therefore feeds O(k) rows,
    *    never the whole rewritten file.
    *  - a commit without a persisted slice (appends — their new files
    *    ARE the insert slice, so persisting one would double-write the
    *    data; `create`; legacy versions) derives it from the manifest
    *    diff: rows of files that LEFT the manifest emit as `'delete'`,
    *    rows of files that JOINED it as `'insert'`. An untouched row of
    *    a legacy-rewritten file appears as a same-version delete+insert
    *    pair of EQUAL images — consumers fold per key with
    *    latest-version-wins, counting `update_postimage` with `insert`
    *    and `update_preimage` with `delete`, and classify equal-image
    *    churn as no-op (the [[Ingest.diff]] statuses fall out: a key
    *    whose FIRST feed touch is a delete existed at the base).
    *
    * `fromVersion = 0` means "before the first commit" and is valid only
    * while version 1 is still retained; any gap (a consumed-from version
    * already pruned) fails loudly — widen `keepVersions` to the feed lag
    * you need, never guess across a gap. Columns: the `toVersion`
    * schema (additive evolution keeps every historical column), plus
    * `_change_type`, `_commit_version`.
    */
  def readChanges(fromVersion: Long, toVersion: Long): DataFrame = {
    val vs = versions()
    require(toVersion > fromVersion,
      s"readChanges needs toVersion > fromVersion: $fromVersion..$toVersion")
    require(vs.contains(toVersion),
      s"version $toVersion is not committed/retained under $path")
    require(if (fromVersion == 0L) vs.head == 1L else vs.contains(fromVersion),
      s"change feed gap: version $fromVersion is no longer retained under " +
        s"$path (retained: ${vs.mkString(", ")}) — increase keepVersions " +
        "to cover the consumer's lag")
    val m = readMeta(spark, path, toVersion)
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sliceSchema =
      StructType(m.schema.fields :+ StructField(ChangeType, StringType))
    val fileSets = scala.collection.mutable.Map[Long, Set[String]](
      0L -> Set.empty[String])
    def fileSet(w: Long): Set[String] =
      fileSets.getOrElseUpdate(w, storedFiles(w).toSet)
    val parts = ((fromVersion + 1) to toVersion).flatMap { w =>
      if (f.exists(new Path(s"$path/v$w/_changes_none")))
        Seq.empty // provably-empty slice (relayout/policy): feeds NOTHING
      else if (f.exists(new Path(s"$path/v$w/_changes/_SUCCESS")))
        Seq(spark.read.schema(sliceSchema).parquet(s"$path/v$w/_changes")
          .withColumn("_commit_version", lit(w)))
      else {
        val prev = fileSet(w - 1)
        val cur = fileSet(w)
        def part(fl: Seq[String], tpe: String): Option[DataFrame] =
          if (fl.isEmpty) None
          else Some(spark.read.schema(m.schema).parquet(fl.map(resolve): _*)
            .withColumn(ChangeType, lit(tpe))
            .withColumn("_commit_version", lit(w)))
        part((prev -- cur).toSeq.sorted, "delete") ++
          part((cur -- prev).toSeq.sorted, "insert")
      }
    }
    if (parts.isEmpty)
      readVersion(toVersion).limit(0)
        .withColumn(ChangeType, lit(""))
        .withColumn("_commit_version", lit(0L))
    else parts.reduce(_.unionByName(_))
  }

  /** [[readChanges]] up to the current head. */
  def readChanges(fromVersion: Long): DataFrame =
    readChanges(fromVersion, version)

  /** The row-level change slice commit `v` PERSISTED, or None when it
    * didn't (change feed off, appends, legacy commits) — unlike
    * [[readChanges]] this never widens to the file-granularity diff and
    * never needs `v - 1` retained, so the SQL DML commands can report
    * `num_affected_rows` off the commit they just made even under
    * `keepVersions = 1`.
    */
  def commitChanges(v: Long): Option[DataFrame] = {
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(new Path(s"$path/v$v/_changes_none")))
      Some(emptySlice(schemaAt(v))) // marker = a persisted EMPTY slice
    else if (!f.exists(new Path(s"$path/v$v/_changes/_SUCCESS"))) None
    else Some(spark.read.schema(
      StructType(schemaAt(v).fields :+ StructField(ChangeType, StringType)))
      .parquet(s"$path/v$v/_changes"))
  }

  /** The streaming-source shape over the change feed: resolve every
    * version committed since the durable cursor under `cursorDir`,
    * invoke `f` once per commit with THAT commit's [[readChanges]] slice
    * and its version, and advance the cursor after each callback returns
    * — at-least-once per commit (a consumer crash between callback and
    * cursor write redelivers that commit, never skips one), the
    * foreachBatch discipline with versions as batch ids. A fresh cursor
    * starts after `startAfter` (0 = consume from the very first commit).
    * Single consumer per cursorDir; feed-gap rules are [[readChanges]]'s.
    *
    * `maxVersions` bounds ONE call's work (the `maxFilesPerTrigger` /
    * Delta `maxVersionsPerTrigger` analogue): a burst of commits drains
    * in bounded steps across repeated calls instead of one unbounded
    * pass; cursor semantics are unchanged, so the folded result is
    * identical at any limit.
    *
    * The cursor write is CRASH-SAFE: content lands in a temp file that
    * is renamed over the old cursor, and an unparseable cursor (a crash
    * mid-replace at worst leaves a missing file, a pre-fix truncated one
    * an empty file) falls back to `startAfter` with a loud warning —
    * redelivery, never a wedged consumer.
    *
    * @return number of commits drained this call
    */
  def drainChanges(cursorDir: String, startAfter: Long = 0L,
      maxVersions: Int = Int.MaxValue)(
      f: (DataFrame, Long) => Unit): Long = {
    require(maxVersions > 0, s"maxVersions must be positive: $maxVersions")
    val fy = new Path(cursorDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cp = new Path(s"$cursorDir/cursor")
    val raw = readSmall(fy, cp)
    val cur = raw.flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .getOrElse {
        if (raw.isDefined) DedupIndex.log.warn(
          s"change-feed cursor $cp is unreadable (crash mid-write?) — " +
            s"falling back to startAfter=$startAfter; at-least-once " +
            "delivery means the consumer re-sees commits, never skips them")
        startAfter
      }
    val pending = versions().filter(_ > cur).take(maxVersions)
    pending.foreach { w =>
      f(readChanges(w - 1, w), w)
      val tmp = new Path(s"$cursorDir/.cursor_tmp")
      writeSmall(fy, tmp, w.toString)
      if (fy.exists(cp)) fy.delete(cp, false)
      require(fy.rename(tmp, cp), s"cursor replace failed: $tmp -> $cp")
    }
    pending.size.toLong
  }

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
    // the manifest already records the EXACT per-file row count (`cnt`)
    // — sizing the relayout from its sum ([[approxStats]], cached) costs
    // one metadata fold instead of a full count() scan of the table
    val rows = approxStats(v)._1
    val n = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(n)
    // a pure relayout changes NO rows: persist an EMPTY change slice so
    // the feed serves nothing for this commit instead of churning the
    // whole table through file-diff delete+insert pairs
    publishGeneration(spark, path, out, v + 1,
      m.copy(layoutCols = sortCols), carryForward = None,
      changesEmpty = true, op = "compact")
    (before.size.toLong, files().size.toLong)
  }

  /** REPLACE the table's rows atomically (`SaveMode.Overwrite` through
    * the SQL write path, or INSERT OVERWRITE by API): ONE commit whose
    * manifest holds only the new generation — readers switch snapshots
    * at the rename, never see a mix, and time travel keeps the replaced
    * version within retention. The change feed derives the full
    * delete-old + insert-new from the manifest diff (a replace IS that
    * change). Ledger untouched — like a relayout, a replace does not
    * consume batch ids; schema evolves additively like [[append]].
    */
  def replace(df: DataFrame, nFiles: Int = 0): Unit = {
    val v = version
    val m = readMeta(spark, path, v)
    val evolved = GraftTable.evolveSchema(m, df.schema)
    val sized = if (nFiles > 0) df.repartition(nFiles) else df
    publishGeneration(spark, path, sized, v + 1,
      m.copy(schemaDdl = evolved.toDDL), carryForward = None,
      op = "overwrite")
  }

  /** INCREMENTAL compaction (the `OPTIMIZE … WHERE …` shape): re-layout
    * ONLY the files whose zone stats intersect `preds` into
    * ~`ceil(stripe rows / targetRows)` files (optionally re-sorted),
    * carrying every other manifest row untouched. Row-preserving by
    * construction, commits an EMPTY change slice (a relayout feeds
    * nothing), ledger untouched. At 100 TB this is how compaction debt
    * is actually paid — stripe by stripe behind the ingest frontier,
    * never by rewriting the table ([[compact]]'s whole-table pass).
    * A stripe that prunes to nothing is a NO-OP: no version commits.
    *
    * @return (files rewritten, files carried untouched)
    */
  def compactWhere(preds: Seq[ZoneMap.Pred], targetRows: Long,
      sortCols: Seq[String] = Nil): (Long, Long) = {
    require(preds.nonEmpty, "compactWhere needs at least one predicate — " +
      "use compact() for the whole-table pass")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val v = version
    val m = readMeta(spark, path, v)
    val affected = pruneVersion(v, m, Seq(Seq(preds)))._1.toSet
    if (affected.isEmpty) return (0L, storedFiles(v).size.toLong)
    val carried = manifestDf(v)
      .filter(!col("file").isInCollection(affected))
    val carriedCount = storedFiles(v).size.toLong - affected.size
    val df = spark.read.schema(m.schema)
      .parquet(affected.toSeq.map(resolve): _*)
    // stripe row count from the manifest's exact per-file `cnt` — one
    // metadata-scale aggregate instead of a full count() of the stripe
    val rowsRow = manifestDf(v).filter(col("file").isInCollection(affected))
      .agg(sum("cnt")).head()
    val rows = if (rowsRow.isNullAt(0)) 0L else rowsRow.getLong(0)
    val n = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(n)
    publishGeneration(spark, path, out, v + 1, m,
      carryForward = Some(carried),
      changesEmpty = true, op = "compact",
      carrySnap = carrySnapOf(v, m, affected))
    (affected.size.toLong, carriedCount)
  }

  /** The commit log over the RETAINED versions — (version, operation,
    * files), metadata-only (one marker read + one manifest count per
    * version; versions older than the retention window were pruned with
    * their markers). Legacy versions committed before the marker
    * existed report `"write"`.
    */
  def history(): DataFrame = {
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    versions().map { v =>
      val op = readSmall(f, new Path(s"$path/v$v/_op")).getOrElse("write")
      (v, op, storedFiles(v).size)
    }.toDF("version", "operation", "files")
  }

  /** Zero-row change slice under `schema` — what a row-preserving
    * relayout ([[compact]]/[[zorder]]) commits to the change feed.
    */
  private def emptySlice(schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(schema.fields :+ StructField(ChangeType, StringType)))

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
    // global (min, max) per curve column from the MANIFEST when every
    // column is zone-indexed and numeric (min-of-mins/max-of-maxes is the
    // global bound; cast monotone) — one metadata fold replaces the full
    // column-stats scan of the table. Non-indexed or non-numeric columns
    // keep the data-scan path.
    val numeric: Set[String] =
      Set("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT")
    val manifestStats: Option[Map[String, (Double, Double)]] =
      if (cols.forall(c => m.zoneCols.contains(c) &&
          numeric(m.types.getOrElse(c, "").toUpperCase))) {
        val st = columnStats(v)
        def d(a: Any): Double = a match {
          case null => Double.NaN
          case n: Number => n.doubleValue()
          case _ => Double.NaN
        }
        val got = st.collect { case (c, mn, mx, _) if cols.contains(c) =>
          c -> (if (mn == null) (0.0, 0.0) else (d(mn), d(mx)))
        }.toMap
        if (cols.forall(c => got.get(c).exists(p =>
          !p._1.isNaN && !p._2.isNaN))) Some(got) else None
      } else None
    val key = Layout.zkey(cols,
      manifestStats.getOrElse(Layout.colStats(df, cols)), bits)
    val out = df.withColumn("__zkey", key)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
    publishGeneration(spark, path, out, v + 1,
      m.copy(layoutCols = cols), carryForward = None,
      changesEmpty = true, op = "zorder")
  }

  /** Delete data files no committed manifest references (orphans from
    * crashed publishes, generations superseded by compaction/relayout),
    * empty generation dirs, and stale publish-staging dirs. Safe for
    * readers OF THE CURRENT VERSION; a reader still holding a
    * long-superseded version loses its files — the explicit deletion
    * window every public table format documents (Delta VACUUM).
    * Single-writer: never run concurrently with a mutation (an in-flight
    * publish's staging dir would be swept).
    *
    * CLONE SAFETY: a [[GraftTable.shallowClone]] registers itself under
    * the SOURCE's `_clones/`, and a source vacuum REFUSES while live
    * registrations exist — a clone holds absolute references into this
    * root, and sweeping a generation its manifest still pins would break
    * it SILENTLY (the shared-fate failure the public formats only
    * document). Pass `force = true` after confirming every registered
    * clone is gone or divergent, or [[unregisterClone]] the ones you
    * deleted.
    *
    * @return number of data files deleted
    */
  def vacuum(force: Boolean = false): Long = {
    val clones = registeredClones()
    require(clones.isEmpty || force,
      s"graft table $path has ${clones.size} registered shallow clone(s) " +
        s"holding absolute references into this root: " +
        s"${clones.mkString(", ")} — vacuuming the source can silently " +
        "break them. Delete/unregister the clones (unregisterClone) or " +
        "pass force = true after checking vacuumDryRun()")
    val (debris, orphanFiles, deadGens) = sweepPlan()
    val f = fs(spark, path)
    debris.foreach(p => try { f.delete(p, true); () }
      catch { case _: Throwable => () })
    deadGens.foreach { case (p, _) => try { f.delete(p, true); () }
      catch { case _: Throwable => () } }
    orphanFiles.foreach(p => try { f.delete(p, false); () }
      catch { case _: Throwable => () })
    orphanFiles.size.toLong + deadGens.map(_._2.toLong).sum
  }

  /** What a [[vacuum]] WOULD delete, without deleting anything — the
    * blast-radius report (`VACUUM … DRY RUN`): orphan data files,
    * superseded whole generations, and crash debris dirs, as absolute
    * paths. Run this before forcing a vacuum on a cloned source.
    */
  def vacuumDryRun(): Seq[String] = {
    val (debris, orphanFiles, deadGens) = sweepPlan()
    (debris ++ deadGens.map(_._1) ++ orphanFiles).map(_.toUri.getPath)
  }

  /** The sweep set, computed once and shared by [[vacuum]] and
    * [[vacuumDryRun]]: (crash-debris dirs, orphan data files in live
    * generations, (dead generation dir, its data-file count) pairs —
    * whole generations with zero referenced files). Orphan files inside
    * a dead generation are NOT double-listed — the generation dir
    * subsumes them; the count keeps [[vacuum]]'s files-deleted return
    * exact.
    */
  private def sweepPlan(): (Seq[Path], Seq[Path], Seq[(Path, Int)]) = {
    // every RETAINED version's manifest pins its files — time travel
    // must survive a vacuum (only unreferenced-by-anyone files go)
    val referenced = versions().flatMap(storedFiles(_).map(resolve)).toSet
    val f = fs(spark, path)
    // crashed publishes leave hidden staging/aside dirs next to the v
    // dirs, and (rarely) an UNCOMMITTED v{N} remnant — publish never
    // deletes an occupant in place (the lost-commit TOCTOU), it renames
    // it aside; a remnant that somehow stayed is cleared here, in the
    // single-writer maintenance window, where no racing commit exists
    // to lose
    val baseDir = new Path(path)
    val debris =
      if (!f.exists(baseDir)) Nil
      else f.listStatus(baseDir).toSeq.filter { st =>
        st.isDirectory && (st.getPath.getName.startsWith(".v") ||
          (st.getPath.getName match {
            case GraftTable.VerRe(n) =>
              !GraftTable.isCommitted(f, path, n.toLong)
            case _ => false
          }))
      }.map(_.getPath)
    val dataDir = new Path(s"$path/data")
    if (!f.exists(dataDir)) return (debris, Nil, Nil)
    val orphanFiles = Seq.newBuilder[Path]
    val deadGens = Seq.newBuilder[(Path, Int)]
    f.listStatus(dataDir).filter(_.isDirectory).foreach { gen =>
      val it = f.listFiles(gen.getPath, true)
      val orphans = Seq.newBuilder[Path]
      var nOrphans = 0
      var live = false
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) {
          val n = st.getPath.getName
          val isData = n.endsWith(".parquet") && !n.startsWith("_") &&
            !n.startsWith(".")
          if (isData) {
            if (referenced(st.getPath.toUri.getPath)) live = true
            else { orphans += st.getPath; nOrphans += 1 }
          }
        }
      }
      if (!live) deadGens += ((gen.getPath, nOrphans)) // superseded whole
      else orphanFiles ++= orphans.result()
    }
    (debris, orphanFiles.result(), deadGens.result())
  }

  /** Shallow clones registered against THIS table as a source — the
    * destinations [[vacuum]] protects. A registration outliving its
    * clone (the clone dir was deleted wholesale) is fine to
    * [[unregisterClone]].
    */
  def registeredClones(): Seq[String] = {
    val f = fs(spark, path)
    val dir = new Path(s"$path/_clones")
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.filter(_.isFile)
      .flatMap(st => readSmall(f, st.getPath)).sorted
  }

  /** Roots of OTHER graft tables whose data files this table's retained
    * manifests reference by absolute path — non-empty iff this table is
    * a shallow clone that has not fully diverged from its source(s).
    * Metadata-scale (distinct manifest refs of the retained versions);
    * the catalog's RENAME/DROP use it to keep the sources' `_clones`
    * registrations pointing at the clone's current location.
    */
  def cloneSources(): Seq[String] =
    versions().flatMap(storedFiles).distinct
      .filter(_.startsWith("/"))
      .flatMap { r =>
        val i = r.indexOf("/data/g")
        if (i <= 0) None else Some(r.substring(0, i))
      }
      .distinct.filterNot(_ == rootNorm).sorted

  /** Drop `destPath`'s clone registration from this source — after the
    * clone was deleted, or deliberately accepted as divergent-enough.
    */
  def unregisterClone(destPath: String): Unit = {
    val f = fs(spark, path)
    val dir = new Path(s"$path/_clones")
    if (!f.exists(dir)) return
    val target = fs(spark, destPath)
      .makeQualified(new Path(destPath)).toUri.getPath
    f.listStatus(dir).filter(_.isFile).foreach { st =>
      if (readSmall(f, st.getPath).contains(target))
        try { f.delete(st.getPath, false); () }
        catch { case _: Throwable => () }
    }
  }
}
