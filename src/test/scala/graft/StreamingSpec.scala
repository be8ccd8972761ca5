package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming surface: every transform run to completion over the bounded
  * events fixture must agree with its batch equivalent.
  */
class StreamingSpec extends SparkSpec {

  private lazy val batch = Tables.load(spark, sfDir, "events")

  test("tumbling streaming counts equal batch grouping") {
    val stream = EventStreams.readEvents(spark, sfDir)
    val got = EventStreams.runToMemory(spark,
        EventStreams.tumblingCounts(stream), "t_tumble", "complete")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .orderBy("w", "event_type").collect()
    val want = batch
      .groupBy(window(col("ts"), "1 hour").as("window"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .orderBy("w", "event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("readEvents starts on an empty directory (legacy schema fallback) and normalizes ts") {
    import org.apache.spark.sql.types.TimestampType
    // a stream may legitimately start before any file has landed: the
    // declared schema falls back to the historical NANOS-as-long layout
    // instead of dying on schema inference, and ts still normalizes to
    // session-tz TimestampType either way
    val empty = java.nio.file.Files.createTempDirectory("events_empty").toString
    val df = EventStreams.readEvents(spark, empty)
    assert(df.isStreaming, "readEvents must return a streaming frame")
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    // and the populated-dir path agrees on the normalized schema
    assert(EventStreams.readEvents(spark, sfDir).schema("ts").dataType ==
      TimestampType)
  }

  test("streaming dedup drops duplicate event ids") {
    val stream = EventStreams.readEvents(spark, sfDir)
    val deduped = EventStreams.runToMemory(spark,
      EventStreams.dedupEvents(stream).select("event_id"), "t_dedup", "append")
    assert(deduped.count() == batch.select("event_id").distinct().count())
  }

  test("dropDuplicatesWithinWatermark: dups collapse within the horizon, state evicts past it") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(h: Double) = new Timestamp(t0.getTime + (h * 3600000L).toLong)
    val base = java.nio.file.Files.createTempDirectory("dedup_wm").toString
    import spark.implicits._
    // wave 1: K at t0 (state expiry t0+1h), L at t0+3h (expiry t0+4h)
    Seq((100L, at(0)), (200L, at(3))).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$base/in/w0")
    // wave 2: L's duplicate within its horizon — dropped; M at t0+6h
    // advances the NEXT batch's watermark to t0+5h, past K's expiry
    // (eviction happens between batches, so the watermark-advancer and
    // the re-sent duplicate need separate waves)
    Seq((200L, at(3.5)), (300L, at(6))).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$base/in/w1")
    // wave 3: K re-sent after its state evicted — re-emitted, the
    // bounded-state trade the operator makes past the horizon
    Seq((100L, at(7))).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$base/in/w2")
    graft.operators.SeriesSearch.pinArrivalOrder(
      spark, Seq(s"$base/in/w0", s"$base/in/w1", s"$base/in/w2"))
    def waves() = spark.readStream.schema("event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in/w*")
    val bounded = EventStreams.runToMemory(spark,
      EventStreams.dedupEventsBounded(waves(), watermark = "1 hour"),
      "t_dedup_wm", "append")
    val emitted = bounded.groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(emitted == Map(100L -> 2L, 200L -> 1L, 300L -> 1L),
      s"K must re-emit after eviction, L must collapse in-horizon: $emitted")
    // contrast: the unbounded-state dedup keeps every key exactly once —
    // exactness the bounded form deliberately trades past the horizon
    val exact = EventStreams.runToMemory(spark,
      EventStreams.dedupEvents(waves(), watermark = "1 hour",
        keys = Seq("event_id")), "t_dedup_exact", "append")
    assert(exact.count() == 3)
  }

  test("session windows produce per-user sessions covering all events") {
    val stream = EventStreams.readEvents(spark, sfDir)
    val sessions = EventStreams.runToMemory(spark,
      EventStreams.sessionCounts(stream, gap = "30 minutes"), "t_sess", "complete")
    assert(sessions.agg(sum("n")).head().getLong(0) == batch.count())
  }

  test("stream-stream interval join equals the batch join") {
    val stream = EventStreams.readEvents(spark, sfDir)
    val got = EventStreams.runToMemory(spark,
        EventStreams.purchaseAfterClick(stream), "t_ssjoin", "append")
      .orderBy("purchase_id", "click_id").collect()
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val want = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .join(clicks, col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 minutes"))
      .select("purchase_id", "click_id")
      .orderBy("purchase_id", "click_id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("stream-stream LEFT OUTER join: null wings flush and equal the batch left join") {
    val got = EntryStream.streamLeftJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val want = clicks.join(
        batch.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"),
            col("event_id").as("purchase_id"), col("ts").as("p_ts")),
        col("c_user") === col("p_user") && col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 minutes"),
        "left_outer")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    assert(got.sorted == want,
      "every click must emit exactly once - matched rows immediately, " +
        "null wings on watermark passage (the sentinel contract)")
    assert(got.exists(_._2 == -1L), "the fixture must exercise the null wing")
  }

  test("drainWithSentinels on an all-null corpus fails BEFORE landing any wave") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sent").toString
    val bad = Seq((1L, null: java.sql.Timestamp),
      (2L, null: java.sql.Timestamp)).toDF("event_id", "ts")
    intercept[IllegalArgumentException] {
      EventStreams.drainWithSentinels(bad, dir, "ts", waves = 1)(
        (_, ts) => Seq((-1L, ts)).toDF("event_id", "ts"))
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/w0")),
      "a refused drain must leave no partial sentinel layout behind")
  }

  test("Scratch dirs are swept recursively; later dirs still register") {
    val a = graft.Scratch.dir("graft_scr_a")
    java.nio.file.Files.write(java.nio.file.Paths.get(a, "x.txt"),
      "payload".getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(a, "sub"))
    java.nio.file.Files.write(java.nio.file.Paths.get(a, "sub", "y.txt"),
      "nested".getBytes)
    graft.Scratch.sweep()
    assert(!new java.io.File(a).exists(),
      "sweep must remove a scratch dir and everything under it")
    // the hook registers once, but dirs created AFTER a sweep still sweep
    val b = graft.Scratch.dir("graft_scr_b")
    java.nio.file.Files.write(java.nio.file.Paths.get(b, "z.txt"),
      "again".getBytes)
    graft.Scratch.sweep()
    assert(!new java.io.File(b).exists())
  }

  test("flatMapGroupsWithState running totals reach the batch totals") {
    val stream = EventStreams.readEvents(spark, sfDir)
    val totals = EventStreams.runToMemory(spark,
      EventStreams.userRunningTotals(spark, stream).toDF(), "t_state", "update")
    // last update per user == batch per-user counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("userId").orderBy(col("nEvents").desc)
    val latest = totals.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("userId"), col("nEvents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = batch.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == want)
  }

  test("transformWithState map-state counts reach the batch per-(user,type) counts") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEvents(spark, sfDir)
      val updates = EventStreams.runToMemory(spark,
        EventStreams.userTypeCounts(spark, stream).toDF(), "t_tws", "update")
      // counts are monotone: the max emitted per cell is the final state
      val latest = updates.groupBy("userId", "eventType")
        .agg(max(col("n")).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = batch.groupBy("user_id", "event_type").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(latest == want)
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming EWMA value-state reaches the batch EWMA's final value per user") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEvents(spark, sfDir)
      val updates = EventStreams.runToMemory(spark,
        EventStreams.userEwma(spark, stream, alpha = 0.3).toDF(), "t_ewma", "update")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("userId").orderBy(col("nEvents").desc)
      val got = updates.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // batch oracle: last EWMA value per user in the same (ts, tie) order
      val batchEwma = graft.operators.Resample.ewma(
        batch, "user_id", "ts", "value", alpha = 0.3, tieCols = Seq("event_id"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val want = batchEwma.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
        .select("user_id", "ewma")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet)
      for ((u, v) <- want)
        assert(math.abs(got(u) - v) < 1e-9, s"user $u: stream ${got(u)} vs batch $v")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("file-sink checkpoint recovery: restart processes only new files, exactly once") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val in = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ck = Files.createTempDirectory("stream_ck").toString
    val schema = StructType(Seq(StructField("event_id", LongType)))
    def stream() = spark.readStream.schema(schema).parquet(in)
      .withColumn("doubled", col("event_id") * 2)
    def write(ids: Range): Unit = {
      import spark.implicits._
      ids.map(_.toLong).toDF("event_id").write.mode("append").parquet(in)
    }

    write(1 to 100)
    EventStreams.drainToParquet(stream(), out, ck)
    assert(spark.read.parquet(out).count() == 100)

    // New files arrive; a fresh query on the SAME checkpoint must pick up
    // exactly the delta — nothing reprocessed, nothing lost.
    write(101 to 150)
    EventStreams.drainToParquet(stream(), out, ck)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 150)
    assert(rows.select("event_id").distinct().count() == 150)
    assert(rows.filter(col("doubled") =!= col("event_id") * 2).isEmpty)
  }

  test("event-time timers close idle sessions; emissions partition the batch sessions") {
    import org.apache.spark.sql.expressions.Window
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = EventStreams.runToMemory(spark,
        EventStreams.timedSessions(spark, EventStreams.readEvents(spark, sfDir))
          .toDF(), s"timer_sessions_${System.nanoTime()}", "update")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))
      val eventClosed = out.filter(_._5 == "event")
        .map(t => (t._1, t._2, t._3, t._4)).toSet
      val timerClosed = out.filter(_._5 == "timer")
        .map(t => (t._1, t._2, t._3, t._4)).toSet
      // batch sessions under the processor's exact micros gap rule
      val ev = Tables.load(spark, sfDir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), expr("unix_micros(ts)").as("tus"))
      val w = Window.partitionBy("user_id").orderBy("tus")
      val sess = ev
        .withColumn("brk", when(lag("tus", 1).over(w).isNull ||
          col("tus") - lag("tus", 1).over(w) >= 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("tus").as("stus"), max("tus").as("etus"),
          count(lit(1)).as("n"))
        .withColumn("rdesc", row_number().over(
          Window.partitionBy("user_id").orderBy(col("stus").desc)))
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("stus"), r.getAs[Long]("etus"),
          r.getAs[Long]("n"), r.getAs[Int]("rdesc")))
      def sec(t: (Long, Long, Long, Long, Int)) =
        (t._1, t._2 / 1000000L, t._3 / 1000000L, t._4)
      val nonLast = sess.filter(_._5 > 1).map(sec).toSet
      val last = sess.filter(_._5 == 1)
      // event-closed emissions are exactly the non-final sessions
      assert(eventClosed == nonLast)
      // timers fired, never double-emitted, and only ever a final session
      assert(timerClosed.nonEmpty, "no timer ever fired")
      assert((timerClosed & eventClosed).isEmpty)
      assert(timerClosed.subsetOf(last.map(sec).toSet))
      // every final session the final watermark passed MUST have fired:
      // wm(ms) = max event time(ms) - 2h delay; fire if end+gap <= wm
      val maxUs = sess.map(_._3).max
      val wmMs = maxUs / 1000L - 7200000L
      val mustFire = last
        .filter(t => t._3 / 1000L + 1800000L <= wmMs).map(sec).toSet
      assert(mustFire.subsetOf(timerClosed),
        s"${(mustFire -- timerClosed).size} watermark-passed sessions never fired")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("foreachBatch upsert sink: serving table equals batch agg; replay converges") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("upsert_out").toString + "/table"
    val ck = Files.createTempDirectory("upsert_ck").toString
    def counts() = EventStreams.readEvents(spark, sfDir)
      .groupBy("user_id").count()
    EventStreams.upsertToParquet(counts().toDF(), Seq("user_id"), out, ck)
    val expect = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def table(): Map[Long, Long] = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(table() == expect)
    // resuming on the same checkpoint processes nothing; table unchanged
    EventStreams.upsertToParquet(counts().toDF(), Seq("user_id"), out, ck)
    assert(table() == expect)
    // full replay on a FRESH checkpoint re-applies every batch — upsert
    // converges to the same table (at-least-once safety)
    val ck2 = Files.createTempDirectory("upsert_ck2").toString
    EventStreams.upsertToParquet(counts().toDF(), Seq("user_id"), out, ck2)
    assert(table() == expect)
    // crash-safety of the stage-then-swap publication: simulate a death
    // BETWEEN the live-dir delete and the rename — no live table, but a
    // COMPLETE staging dir. The next run must recover the history from
    // staging, not silently restart from scratch.
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(out),
      new org.apache.hadoop.fs.Path(s"$out.staging")),
      "test setup: demote the live table to a committed staging dir")
    val ck3 = Files.createTempDirectory("upsert_ck3").toString
    EventStreams.upsertToParquet(counts().toDF(), Seq("user_id"), out, ck3)
    assert(table() == expect,
      "a swap that died between delete and rename must lose no history")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out.staging")),
      "recovery must republish and clear the staging dir")
  }

  test("upsert publication: recovery completes the swap BEFORE merging, so a second crash cannot destroy the only copy") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val out = java.nio.file.Files.createTempDirectory("upsert2")
      .toString + "/table"
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    EventStreams.upsertBatch(
      Seq((1L, 10L), (2L, 20L)).toDF("user_id", "n"), Seq("user_id"), out)
    def table() = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val v1 = table()
    // died swap: live demoted to a committed staging dir
    assert(fs.rename(new Path(out), new Path(s"$out.staging")))
    // the recovery batch CRASHES during the merge (raise_error fires at
    // the eager materialization). The fix under test: the interrupted
    // swap must have been COMPLETED first — live restored, staging gone —
    // so the merge's staging overwrite can never hold the only copy.
    // Pre-fix, staging stayed the base AND the overwrite target: this
    // assertion set fails there with live absent.
    val poisoned = Seq((3L, 30L)).toDF("user_id", "n")
      .withColumn("n", when(col("n") === 30L,
        expr("raise_error('injected crash')").cast("long"))
        .otherwise(col("n")))
    intercept[Throwable] {
      EventStreams.upsertBatch(poisoned, Seq("user_id"), out)
    }
    assert(fs.exists(new Path(out)),
      "live table must be restored before the recovery batch merges")
    assert(table() == v1, "no history may be lost by the failed recovery")
    assert(!fs.exists(new Path(s"$out.staging")),
      "the interrupted staging copy must have been renamed, not re-read in place")
    // and the redelivered batch completes normally on top of full history
    EventStreams.upsertBatch(
      Seq((3L, 30L)).toDF("user_id", "n"), Seq("user_id"), out)
    assert(table() == v1 + ((3L, 30L)))
  }
}
