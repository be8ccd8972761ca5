package graft

import graft.operators.Resample
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Gap-fill semantics: dense (key × day) grid, explicit zeros, totals
  * preserved.
  */
class ResampleSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyCounts emits the dense grid with zero rows for gap days") {
    import spark.implicits._
    val events = Seq(
      ("a", ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 11:00:00")),
      ("a", ts("2024-01-03 09:00:00")),
      ("b", ts("2024-01-02 12:00:00"))
    ).toDF("k", "ts")
    val got = Resample.dailyCounts(events, "k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .toSet
    val want = Set(
      ("a", "2024-01-01", 2L), ("a", "2024-01-02", 0L), ("a", "2024-01-03", 1L),
      ("b", "2024-01-01", 0L), ("b", "2024-01-02", 1L), ("b", "2024-01-03", 0L))
    assert(got == want)
  }

  test("grid covers every key times every day in span; totals are preserved") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val day = 1 + rnd.nextInt(28)
      (s"k${rnd.nextInt(5)}", ts(f"2024-02-$day%02d ${rnd.nextInt(24)}%02d:00:00"))
    }
    val df = rows.toDF("k", "ts")
    val filled = Resample.dailyCounts(df, "k", "ts").cache()
    val nKeys = df.select("k").distinct().count()
    val span = df.agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts")))))
      .head().getInt(0) + 1
    assert(filled.count() == nKeys * span, "grid must be keys x days exactly")
    assert(filled.agg(sum("n")).head().getLong(0) == 500L, "counts must total the input rows")
    assert(filled.groupBy("k", "day").count().filter(col("count") > 1).count() == 0,
      "each (key, day) cell appears exactly once")
    filled.unpersist()
  }

  test("null keys form a real grid row; null timestamps are excluded") {
    import spark.implicits._
    val events = Seq(
      (Some("a"), Some(ts("2024-03-01 08:00:00"))),
      (None, Some(ts("2024-03-01 09:00:00"))),
      (None, Some(ts("2024-03-03 10:00:00"))),
      (Some("a"), None) // no place on the calendar axis
    ).toDF("k", "ts")
    val got = Resample.dailyCounts(events, "k", "ts")
      .collect()
      .map(r => (Option(r.getString(0)), r.getDate(1).toString, r.getLong(2)))
      .toSet
    val want = Set(
      (Some("a"), "2024-03-01", 1L), (Some("a"), "2024-03-02", 0L),
      (Some("a"), "2024-03-03", 0L),
      (None, "2024-03-01", 1L), (None, "2024-03-02", 0L),
      (None, "2024-03-03", 1L))
    assert(got == want)
  }

  test("ewma replays the hand-computed recurrence per key") {
    val rows = Seq(
      ("a", Timestamp.valueOf("2024-03-01 00:00:00"), 10.0),
      ("a", Timestamp.valueOf("2024-03-01 00:01:00"), 20.0),
      ("a", Timestamp.valueOf("2024-03-01 00:02:00"), 30.0),
      ("b", Timestamp.valueOf("2024-03-01 00:00:00"), 100.0))
    val df = spark.createDataFrame(rows).toDF("k", "ts", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Resample.ewma(d, "k", "ts", "v", alpha = 0.5)
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(3)))
        .toSet
    val got = run(df)
    // a: 10 -> .5*20+.5*10=15 -> .5*30+.5*15=22.5 ; b resets to 100
    val want = Set(
      ("a", Timestamp.valueOf("2024-03-01 00:00:00"), 10.0),
      ("a", Timestamp.valueOf("2024-03-01 00:01:00"), 15.0),
      ("a", Timestamp.valueOf("2024-03-01 00:02:00"), 22.5),
      ("b", Timestamp.valueOf("2024-03-01 00:00:00"), 100.0))
    assert(got == want)
    // key-change reset and fold order survive any input partitioning
    assert(run(df.repartition(7)) == want)
    assert(run(df.coalesce(1)) == want)
  }

  test("sessionize: gap boundary starts a new session, ids are per-key and 0-based") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 00:$m%02d:00")
    val rows = Seq(
      ("a", ts(0), 1L), ("a", ts(10), 2L),  // within 30m gap
      ("a", ts(40), 3L),                    // exactly 30m after -> new session
      ("a", ts(55), 4L),
      ("b", ts(0), 5L))
    val df = spark.createDataFrame(rows).toDF("k", "ts", "eid")
    def run(d: org.apache.spark.sql.DataFrame) =
      Resample.sessionize(d, "k", "ts", gapSeconds = 1800, tieCols = Seq("eid"))
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    val want = Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("b", 5L, 0L))
    assert(run(df) == want)
    assert(run(df.repartition(5)) == want)
  }

  test("sessionize plans one exchange for the lag and running-sum windows") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 00:$m%02d:00")
    val df = spark.createDataFrame(Seq(("a", ts(0), 1L), ("a", ts(40), 2L)))
      .toDF("k", "ts", "eid")
    val plan = Resample.sessionize(df, "k", "ts", 1800, Seq("eid"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("ewma excludes null timestamps and null values from the recurrence") {
    val rows = Seq(
      ("a", Some(Timestamp.valueOf("2024-03-01 00:00:00")), Some(10.0)),
      ("a", None, Some(999.0)),
      ("a", Some(Timestamp.valueOf("2024-03-01 00:01:00")), None),
      ("a", Some(Timestamp.valueOf("2024-03-01 00:02:00")), Some(20.0)))
    val df = spark.createDataFrame(rows).toDF("k", "ts", "v")
    val got = Resample.ewma(df, "k", "ts", "v", alpha = 0.5)
      .collect().map(r => (r.getTimestamp(1), r.getDouble(3))).toSet
    assert(got == Set(
      (Timestamp.valueOf("2024-03-01 00:00:00"), 10.0),
      (Timestamp.valueOf("2024-03-01 00:02:00"), 15.0)))
  }
}
