package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.types._

/** Structured Streaming surface over `events`-shaped data — the unbounded
  * analogue of the reference's channel pipeline (its stages stream tuples as
  * produced, `crawler.go:215-230`, but over bounded input; here the input is
  * genuinely unbounded with event-time semantics the reference lacks).
  *
  * Every transform takes and returns streaming DataFrames so callers compose
  * them ahead of a `writeStream`. Watermarks bound state; all aggregations
  * are keyed so state partitions across executors.
  */
object EventStreams {

  /** Stream schema with `ts` at the given on-disk type. The fixture has
    * shipped as both TIMESTAMP(NANOS) (reads as a nanosecond Long under
    * `legacy.parquet.nanosAsLong`) and timestamp[us] (infers as
    * TIMESTAMP_NTZ); the file-stream source needs the declared schema to
    * match the files, so [[readEvents]] sniffs it from the parquet footer.
    */
  def eventSchema(tsType: org.apache.spark.sql.types.DataType = LongType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** File-source stream over the events parquet in `dir` (the file-stream
    * source requires a directory path, so the table file is glob-filtered).
    * `ts` is normalized to session-tz TimestampType whatever the on-disk
    * representation (same contract as [[graft.Tables.load]]).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // one footer read (no data scan) to learn the on-disk ts type — the
    // declared stream schema must match the files byte-for-byte. A stream
    // may legitimately start before any file has landed: fall back to the
    // historical NANOS-as-long layout so the stream starts and waits,
    // instead of failing schema inference on an empty dir. The fallback
    // is gated on an EXPLICIT existence check, not a broad catch — a
    // corrupt footer or missing ts column must still fail loudly here,
    // not resurface as a confusing mid-batch type error.
    val fileExists = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(p, "events.parquet"))
    }
    val tsType =
      if (!fileExists) LongType
      else spark.read
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .schema("ts").dataType
    val base = spark.readStream.schema(eventSchema(tsType))
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType => base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => base.withColumn("ts", col("ts").cast("timestamp"))
      case _ => base
    }
  }

  /** Tumbling-window counts with a watermark bounding state. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))

  /** Sliding-window counts. */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows per user with an inactivity gap. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Stream-stream interval self-join: pair each purchase with the clicks
    * of the same user in the preceding `within` interval. Both sides carry
    * watermarks so the join state is bounded — the canonical funnel query
    * shape. Returns (purchase event_id, click event_id).
    */
  def purchaseAfterClick(events: DataFrame, within: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $within"))
      .select(col("purchase_id"), col("click_id"))
  }

  /** Stream-stream LEFT OUTER interval join — the attribution query:
    * every click emits, paired with the same user's purchases in the
    * following `within` interval, or with a NULL purchase once the
    * watermark proves no match can still arrive. The null wing is the
    * semantics [[purchaseAfterClick]]'s inner join cannot express, and
    * it exercises a distinct engine path: unmatched left state is
    * EVICTED-and-emitted by watermark passage, not matched-and-emitted
    * by arriving rows.
    *
    * Bounded-drain caveat that shapes the fixture contract: null-wing
    * rows only emit when the GLOBAL watermark (the min across both
    * branches) passes `click ts + within`, and each branch's watermark
    * advances only from rows that branch actually scans — the type
    * filters are pushed below the watermark operator into the source, so
    * a sentinel of a type neither branch keeps moves NOTHING. A caller
    * draining a bounded fixture must append one far-future sentinel PER
    * TYPE with a NULL user_id: null keys can never equi-join (no fake
    * pairs), the purchase sentinel's watermark lets every real click
    * evict, and the click sentinel itself surfaces as one null-wing row
    * the caller drops by its negative id.
    */
  /** Bounded-drain fixture layout for stream-stream OUTER joins (and any
    * watermark-flushed operator): land `corpus` as ONE file, then one
    * file per caller-built sentinel wave stamped `i` days past the
    * corpus max `tsCol`, with file mtimes pinned ascending
    * ([[graft.operators.SeriesSearch.pinArrivalOrder]]). Processed with
    * `maxFilesPerTrigger=1` this guarantees:
    *  - the whole corpus shares a micro-batch (part files are NOT
    *    time-ordered across each other, so per-file corpus batches would
    *    drop genuinely-early rows as late data once a later-ts file
    *    advanced the watermark);
    *  - each sentinel wave gets its OWN, LATER batch, so the "batch
    *    after the watermark moved" the flush needs actually exists
    *    instead of leaning on the no-data-micro-batch feature.
    * Sentinel subtlety the waves must respect (the reason this helper
    * exists): watermarks advance only from rows a branch actually SCANS
    * — branch filters push below the watermark operator — so a wave
    * needs one row PER branch-surviving type, with NULL join keys (null
    * never equi-joins) and negative ids the caller drops from its own
    * output.
    *
    * @return the glob to `readStream` from
    */
  def drainWithSentinels(corpus: DataFrame, dir: String, tsCol: String,
      waves: Int)(mkWave: (Int, java.sql.Timestamp) => DataFrame): String = {
    require(waves >= 1, "at least one sentinel wave is needed to flush")
    // validate BEFORE landing w0: an all-null/empty corpus must fail
    // without leaving a partial sentinel layout behind
    val hiRow = corpus.agg(max(col(tsCol))).head
    require(!hiRow.isNullAt(0), "drainWithSentinels needs a non-empty " +
      s"corpus with at least one non-null $tsCol row — sentinel waves " +
      "are timed strictly past its maximum")
    val hi = hiRow.getTimestamp(0)
    corpus.coalesce(1).write.parquet(s"$dir/w0")
    (1 to waves).foreach { i =>
      val ts = new java.sql.Timestamp(hi.getTime + 86400000L * i)
      mkWave(i, ts).coalesce(1).write.parquet(s"$dir/w$i")
    }
    graft.operators.SeriesSearch.pinArrivalOrder(
      corpus.sparkSession, (0 to waves).map(i => s"$dir/w$i"))
    s"$dir/w*"
  }

  def purchaseAttribution(events: DataFrame, within: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val purchases = wm.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $within"),
      "left_outer")
      .select(col("click_id"), col("purchase_id"))
  }

  /** Streaming dedup on the given key columns within the watermark
    * horizon — late duplicates beyond it are dropped with their state.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour",
      keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(keys)

  /** Bounded-state streaming dedup (Spark 4
    * `dropDuplicatesWithinWatermark`): duplicates arriving within the
    * watermark horizon of each other are guaranteed dropped, and a key's
    * state is EVICTED once the watermark passes its event time — so state
    * is bounded by the horizon's key-arrival rate, not the stream's
    * lifetime key count. [[dedupEvents]]'s plain `dropDuplicates` keeps
    * every key forever (exact dedup, unbounded state) — the right tool
    * only when the key domain itself is bounded; THIS is the 100 TB
    * continuous-ingest shape, trading exactness beyond the horizon for
    * state that cannot grow without bound. The event-time column stays
    * OUT of the keys: physical duplicates of one logical event may carry
    * slightly different timestamps and still collapse.
    */
  def dedupEventsBounded(events: DataFrame, watermark: String = "1 hour",
      keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)

  final case class UserState(userId: Long, nEvents: Long, totalValue: Double)

  /** Custom keyed state via flatMapGroupsWithState: running per-user event
    * count + value sum, one updated record emitted per batch per active key
    * (the streaming analogue of the reference's per-worker fold, O3).
    */
  def userRunningTotals(spark: SparkSession, events: DataFrame): Dataset[UserState] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) => {
          val prev = state.getOption.getOrElse(UserState(key, 0L, 0.0))
          var n = prev.nEvents
          var tot = prev.totalValue
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserState(key, n, tot)
          state.update(next)
          Iterator.single(next)
        })
  }

  final case class TypeCount(userId: Long, eventType: String, n: Long)

  /** Per-(user, event-type) running counts as a [[StatefulProcessor]] for
    * the Spark 4 `transformWithState` API: one typed [[MapState]] per
    * user key (event type → count), updated per micro-batch, emitting the
    * new totals of the types touched in the batch. Richer state shape
    * than [[userRunningTotals]]'s single-value GroupState — the map is
    * point-readable/updatable per entry on the RocksDB store, so a key's
    * state no longer has to fit in one deserialized value.
    */
  private[streaming] class TypeCountProcessor
      extends StatefulProcessor[Long, (Long, String), TypeCount] {
    import org.apache.spark.sql.Encoders
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val batch = rows.foldLeft(Map.empty[String, Long]) { case (m, (_, t)) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
      batch.foreach { case (t, c) =>
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, prev + c)
      }
      batch.keysIterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  final case class EwmaState(userId: Long, ewma: Double, nEvents: Long)

  /** Streaming EWMA as a [[StatefulProcessor]] with a single typed
    * [[org.apache.spark.sql.streaming.ValueState]] cell per key — the
    * streaming face of [[graft.operators.Resample.ewma]], same
    * recurrence, same fold order. Micro-batch input iterators carry no
    * ordering guarantee, so each batch's rows are buffered and sorted by
    * (ts, tie) before folding; batches themselves arrive in source
    * order, giving the cross-batch ordering (the file/kafka-offset
    * contract). Emits the updated state once per key per batch.
    */
  private[streaming] class EwmaProcessor(alpha: Double)
      extends StatefulProcessor[Long, (Long, Long, Long, Double), EwmaState] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.ValueState
    @transient private var state: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long, Double)],
        timerValues: TimerValues): Iterator[EwmaState] = {
      val ordered = rows.toIndexedSeq.sortBy(r => (r._2, r._3))
      if (ordered.isEmpty) Iterator.empty
      else {
        var (s, n) = if (state.exists()) (state.get().ewma, state.get().nEvents)
        else (0.0, 0L)
        ordered.foreach { case (_, _, _, v) =>
          s = if (n == 0L) v else alpha * v + (1.0 - alpha) * s
          n += 1
        }
        val next = EwmaState(key, s, n)
        state.update(next)
        Iterator.single(next)
      }
    }
  }

  /** Per-user streaming EWMA over (ts, event_id)-ordered values via
    * `transformWithState` (RocksDB ValueState). The drained final state
    * per user equals the batch [[graft.operators.Resample.ewma]]'s last
    * value — asserted in StreamingSpec.
    */
  def userEwma(spark: SparkSession, events: DataFrame, alpha: Double): Dataset[EwmaState] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "value")
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor(alpha), TimeMode.None(), OutputMode.Update())
  }

  /** Per-(user, event-type) running counts via `transformWithState` —
    * the arbitrary-state API that supersedes flatMapGroupsWithState in
    * Spark 4 (typed value/list/map state cells, timers, TTL). Requires
    * the RocksDB state store provider; set it on the session before
    * starting the query (see [[StreamingSpec]] / the declared query).
    * After the stream drains, the final count per (user, type) equals
    * the batch `groupBy(user_id, event_type).count()` — the oracle.
    */
  def userTypeCounts(spark: SparkSession, events: DataFrame): Dataset[TypeCount] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class SessionOut(
    userId: Long, ss: Long, se: Long, n: Long, closedBy: String)
  // NOT private: the state encoder's generated (Janino) code lives outside
  // this class and cannot call accessors on a private case class — Spark
  // would silently fall back to interpreted row encoding on every update.
  final case class SessionAgg(start: Long, end: Long, n: Long)

  /** Inactivity sessionization with EVENT-TIME TIMERS: a session closes
    * either when a later event of the same key arrives ≥ gap after it
    * (`closedBy = "event"`, deterministic — no watermark involved) or
    * when the watermark passes its end + gap and the registered timer
    * fires (`closedBy = "timer"`, the piece `session_window` can't give
    * you: sessions emit WITHOUT waiting for the next event of that key,
    * which for a churned user never comes).
    *
    * One timer per key, re-armed on every batch; a stale timer firing
    * after its session was already closed by an event is rejected by the
    * end+gap ≤ expiry guard. Times are epoch seconds (micros floored).
    */
  private[streaming] class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, (Long, Long), SessionOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.ValueState
    @transient private var state: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionAgg](
        "sess", Encoders.product[SessionAgg], TTLConfig.NONE)

    private def emit(key: Long, s: SessionAgg, closedBy: String): SessionOut =
      SessionOut(key, s.start / 1000000L, s.end / 1000000L, s.n, closedBy)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      val ts = rows.map(_._2).toArray.sorted
      var cur = if (state.exists()) Option(state.get()) else None
      ts.foreach { t =>
        cur match {
          case Some(s) if t - s.end >= gapMicros =>
            out += emit(key, s, "event")
            cur = Some(SessionAgg(t, t, 1L))
          case Some(s) =>
            cur = Some(SessionAgg(s.start, math.max(s.end, t), s.n + 1L))
          case None =>
            cur = Some(SessionAgg(t, t, 1L))
        }
      }
      cur.foreach { s =>
        state.update(s)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.end / 1000L + gapMicros / 1000L)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionOut] = {
      if (state.exists()) {
        val s = state.get()
        if (s.end / 1000L + gapMicros / 1000L <= expiredTimerInfo.getExpiryTimeInMs) {
          state.clear()
          Iterator.single(emit(key, s, "timer"))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Per-user inactivity sessions with timer-based close (see
    * [[SessionProcessor]]). `gap` and `watermark` are duration strings.
    */
  def timedSessions(
      spark: SparkSession, events: DataFrame,
      gap: String = "30 minutes", watermark: String = "2 hours"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val micros = gapMicros.days * 86400000000L + gapMicros.microseconds
    events
      .withWatermark("ts", watermark)
      // eventSchema permits null user_id/ts; a null would fail the
      // primitive (Long, Long) decode at runtime, and the batch oracle
      // drops null-key rows anyway
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS tus")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(micros),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Drain everything currently available into a durable parquet sink and
    * stop (AvailableNow trigger). The checkpoint makes restarts
    * exactly-once: a later call with the same checkpoint processes only
    * files that arrived since the last run — the resident-engine
    * durability contract (crash/restart loses nothing, duplicates
    * nothing). Append-mode, so use with non-aggregated transforms or
    * watermark-finalized aggregations.
    */
  /** Stream-static join: enrich the event stream with a BATCH dimension
    * table (the lookup-table pattern — a crawl stream joined to a domain
    * allowlist, events to a user directory). Spark plans the static side
    * as a broadcast per micro-batch; no state store is involved, so
    * unlike a stream-stream join it needs no watermark and tolerates an
    * arbitrarily old dimension. The static frame is re-read per batch —
    * at scale, point it at a small table or cache it.
    */
  def enrichWithStatic(
      events: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), keys, joinType)

  /** foreachBatch upsert sink: apply each micro-batch to a parquet
    * key-value table with latest-wins [[graft.operators.Ingest.upsert]]
    * semantics — the production "merge into the serving copy" sink that
    * plain append sinks can't express. Re-delivered batches converge to
    * the same table (upsert is idempotent per batch), which is exactly
    * the at-least-once guarantee foreachBatch gives after a restart.
    *
    * The target directory is read+rewritten per batch. Fine for a serving
    * table orders of magnitude smaller than the stream; for corpus-sized
    * targets use a format with real MERGE support.
    *
    * Publication is CRASH-SAFE via stage-then-swap — the serving table is
    * the one artifact whose accumulated merge history is NOT re-derivable
    * from a redelivered batch, so it must never be overwritten in place
    * (a crash inside Overwrite's delete-then-write window would lose
    * every earlier batch's rows and the next batch would silently restart
    * from scratch): the FULL merged state lands in a staging dir first,
    * then the live dir is swapped out by delete+rename. A crash at any
    * point leaves either the old table (staging incomplete or complete —
    * the next merge reads the live dir and Overwrite clears staging) or,
    * between the delete and the rename, NO live dir but a COMPLETE
    * staging dir — which the next batch COMPLETES (rename first, then
    * merge normally), so history survives every window INCLUDING a
    * second crash during the recovery batch: staging is never the merge
    * base while also being the overwrite target (it was, once — a crash
    * inside that recovery write would have destroyed the only copy,
    * since localCheckpoint blocks die with the process).
    */
  def upsertToParquet(
      df: DataFrame, keyCols: Seq[String], outDir: String,
      checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch.toDF(), keyCols, outDir)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** One [[upsertToParquet]] micro-batch — package-visible so specs can
    * drive the crash windows directly.
    */
  private[graft] def upsertBatch(
      batch: DataFrame, keyCols: Seq[String], outDir: String): Unit = {
    val spark = batch.sparkSession
    val live = new org.apache.hadoop.fs.Path(outDir)
    val staging = new org.apache.hadoop.fs.Path(s"$outDir.staging")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash-recovery FIRST: a died swap leaves no live dir but a
    // COMPLETE staging dir (_SUCCESS-gated — a torn staging write has
    // no marker). Complete the interrupted rename before merging, so
    // the sole surviving copy is back under the live path before
    // staging becomes an overwrite target again
    if (!fs.exists(live) &&
        fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
      require(fs.rename(staging, live),
        s"failed to complete interrupted publish: rename $staging -> $live")
    val merged =
      if (fs.exists(live))
        graft.operators.Ingest.upsert(spark.read.parquet(outDir), batch, keyCols)
      else batch
    // materialize off the source files, then stage the FULL new state
    // before touching the live dir
    merged.localCheckpoint(eager = true)
      .write.mode("overwrite").parquet(staging.toString)
    fs.delete(live, true)
    require(fs.rename(staging, live),
      s"failed to publish serving table: rename $staging -> $live")
  }

  def drainToParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** Run a (bounded) streaming DataFrame to completion into an in-memory
    * table and return the materialized result — test/verify harness only.
    *
    * Stateful streaming cost is dominated by per-(partition, batch) state
    * store maintenance, so the number of shuffle partitions IS the state
    * parallelism knob: on this single-node harness 8 partitions beat 32 by
    * ~5× on a stream-stream join (and 4 measures the same as 8); on a
    * cluster size it to executor count.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: String = "complete", statePartitions: Int = 8): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // an ephemeral memory-sink run has no recovery story, so its
    // checkpoint (offset/commit logs + state-store deltas, fsynced per
    // micro-batch) belongs on tmpfs when the box has one: the default
    // java.io.tmpdir placement makes every batch commit a disk write,
    // and shared-disk jitter there was the dominant run-to-run variance
    // in the stream bench family. Deleted after the run either way.
    val shm = new java.io.File("/dev/shm")
    val ckpt = if (shm.isDirectory && shm.canWrite)
      Some(java.nio.file.Files.createTempDirectory(shm.toPath, "graft_ckpt_"))
    else None
    try {
      val w0 = df.writeStream.outputMode(mode).format("memory").queryName(name)
      val q = ckpt.fold(w0)(c => w0.option("checkpointLocation", c.toString)).start()
      try q.processAllAvailable()
      finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      ckpt.foreach { c =>
        import scala.jdk.CollectionConverters._
        try java.nio.file.Files.walk(c).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
        catch { case _: Throwable => () } // best-effort cleanup of tmpfs
      }
    }
    // detach the result from the memory sink and drop the temp view so the
    // sink's buffered rows don't stay pinned for the session lifetime
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }
}
