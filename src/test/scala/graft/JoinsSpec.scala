package graft

import java.sql.Timestamp
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join picks latest right row at or before left time, per key") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3"), // before any right row for key 2
      (3L, ts("2024-01-01 09:00:00"), "e4")  // key with no right rows at all
    )).toDF("k", "t", "name")
    val right = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (1L, ts("2024-01-01 13:00:00"), 300L),
      (2L, ts("2024-01-01 10:00:00"), 400L)
    )).toDF("k", "t", "ref")
    val got = AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("ref"))
      .orderBy("name")
      .collect().map(r => (r.getAs[String]("name"), Option(r.getAs[Any]("ref"))))
    assert(got.toSeq == Seq(
      ("e1", Some(100L)), ("e2", Some(200L)), ("e3", None), ("e4", None)))
  }

  test("asof join: inclusive at equal timestamps, tie-break by greatest") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"))).toDF("k", "t", "name")
    val right = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (1L, ts("2024-01-01 10:00:00"), 9L))).toDF("k", "t", "ref")
    val got = AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("ref"),
      tieBreak = Some("ref")).collect()
    assert(got.head.getAs[Long]("ref") == 9L)
  }

  test("asof forward and nearest directions: hand-computed picks, ties go backward") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),  // back 09:00, fwd 12:00 -> back
      (1L, ts("2024-01-01 11:30:00"), "e2"),  // back 09:00, fwd 12:00 -> fwd
      (1L, ts("2024-01-01 10:30:00"), "e3"),  // equidistant 90m -> backward
      (1L, ts("2024-01-01 13:00:00"), "e4"),  // after last right: fwd = none
      (2L, ts("2024-01-01 09:00:00"), "e5")   // no right rows for key 2
    )).toDF("k", "t", "name")
    val right = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L)
    )).toDF("k", "t", "ref")
    def run(dir: String) = AsOfJoin.asof(left, right, "k", "k", "t", "t",
        Seq("ref"), direction = dir).orderBy("name")
      .collect().map(r => (r.getAs[String]("name"),
        Option(r.getAs[Any]("ref")))).toSeq
    assert(run("forward") == Seq(("e1", Some(200L)), ("e2", Some(200L)),
      ("e3", Some(200L)), ("e4", None), ("e5", None)),
      "forward = earliest right at or after")
    assert(run("nearest") == Seq(("e1", Some(100L)), ("e2", Some(200L)),
      ("e3", Some(100L)), ("e4", Some(200L)), ("e5", None)),
      "nearest picks the closer side; the exact tie (e3) goes backward")
    // forward is inclusive at equal timestamps, like backward
    val eq = AsOfJoin.asof(
      spark.createDataFrame(Seq((1L, ts("2024-01-01 12:00:00"), "x")))
        .toDF("k", "t", "name"),
      right, "k", "k", "t", "t", Seq("ref"), direction = "forward").head()
    assert(eq.getAs[Long]("ref") == 200L)
  }

  test("asof forward/nearest tolerance: out-of-range picks null, no fallback") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"))).toDF("k", "t", "name")
    val right = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 09:55:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L))).toDF("k", "t", "ref")
    def run(dir: String, tol: String) = Option(
      AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("ref"),
        tolerance = Some(tol), direction = dir).head().getAs[Any]("ref"))
    assert(run("forward", "30 minutes").isEmpty,
      "the forward pick (12:00) is beyond 30m - nulled")
    assert(run("forward", "3 hours") == Some(200L))
    assert(run("nearest", "2 minutes").isEmpty,
      "nearest picked 09:55 (5m away): out of 2m tolerance, and it must " +
        "NOT fall back to the forward row - the pandas semantics")
    assert(run("nearest", "10 minutes") == Some(100L))
  }

  test("asof join tolerance nulls out stale matches") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 12:00:00"), "fresh"),
      (2L, ts("2024-01-01 12:00:00"), "stale"))).toDF("k", "t", "name")
    val right = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 11:30:00"), 1L),   // 30 min old
      (2L, ts("2024-01-01 09:00:00"), 2L)    // 3 h old
    )).toDF("k", "t", "ref")
    val got = AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("ref"),
        tolerance = Some("1 HOUR"))
      .orderBy("name")
      .collect().map(r => (r.getAs[String]("name"), Option(r.getAs[Any]("ref"))))
    assert(got.toSeq == Seq(("fresh", Some(1L)), ("stale", None)))
  }

  test("asof join carries a consistent snapshot when the latest right row holds nulls") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 12:00:00"), "e1"))).toDF("k", "t", "name")
    val right = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5L), Some("old")),
      (1L, ts("2024-01-01 11:59:00"), None: Option[Long], Some("new"))
    )).toDF("k", "t", "price", "tag")
    // latest row wins as a unit: price must be null (from 11:59), tag "new" —
    // per-column carry would tear price=5 from 09:00 together with tag "new"
    val r = AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("price", "tag")).head()
    assert(r.isNullAt(r.fieldIndex("price")) && r.getAs[String]("tag") == "new")
    // and with tolerance, freshness is judged by the carried row's own time
    val r2 = AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("price", "tag"),
      tolerance = Some("1 HOUR")).head()
    assert(r2.isNullAt(r2.fieldIndex("price")) && r2.getAs[String]("tag") == "new")
  }

  test("bucketed asof (segmented prefix scan) equals the single-window form on a hot key") {
    // One hot key holding 90% of both sides across many hour buckets, plus
    // normal keys — the skew shape asofBucketed exists for. Output must be
    // identical to the full-history window for any monotonic bucketing.
    val rnd = new scala.util.Random(19)
    def at(min: Int): Timestamp = ts(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val left = spark.createDataFrame(
      (0 until 600).map { i =>
        val k = if (i % 10 == 0) (i % 5).toLong + 2L else 1L
        (k, at(rnd.nextInt(1200)), s"e$i")
      }).toDF("k", "t", "name")
    val right = spark.createDataFrame(
      (0 until 300).map { i =>
        val k = if (i % 10 == 0) (i % 5).toLong + 2L else 1L
        (k, at(rnd.nextInt(1200)), i.toLong)
      }).toDF("k", "t", "ref")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("name"), Option(r.getAs[Any]("ref")))
    val plain = AsOfJoin.asof(left, right, "k", "k", "t", "t",
      Seq("ref"), tieBreak = Some("ref")).collect().map(key).toSet
    val bucketed = AsOfJoin.asofBucketed(left, right, "k", "k", "t", "t",
      Seq("ref"), bucketOf = c => date_trunc("hour", c),
      tieBreak = Some("ref")).collect().map(key).toSet
    assert(bucketed == plain)
    // tolerance path agrees too (freshness judged on the carried row)
    val plainTol = AsOfJoin.asof(left, right, "k", "k", "t", "t",
      Seq("ref"), tieBreak = Some("ref"), tolerance = Some("2 HOURS"))
      .collect().map(key).toSet
    val bucketedTol = AsOfJoin.asofBucketed(left, right, "k", "k", "t", "t",
      Seq("ref"), bucketOf = c => date_trunc("hour", c),
      tieBreak = Some("ref"), tolerance = Some("2 HOURS"))
      .collect().map(key).toSet
    assert(bucketedTol == plainTol)
  }

  test("asof edge cases: empty right side yields all-null carries, in both forms") {
    val left = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (2L, ts("2024-01-01 11:00:00"), "e2"))).toDF("k", "t", "name")
    val right = spark.createDataFrame(
      Seq.empty[(Long, java.sql.Timestamp, Long)]).toDF("k", "t", "ref")
    val plain = AsOfJoin.asof(left, right, "k", "k", "t", "t", Seq("ref"))
      .collect().map(r => (r.getAs[String]("name"), r.isNullAt(r.fieldIndex("ref"))))
    assert(plain.toSet == Set(("e1", true), ("e2", true)))
    val bucketed = AsOfJoin.asofBucketed(left, right, "k", "k", "t", "t",
        Seq("ref"), bucketOf = c => date_trunc("hour", c))
      .collect().map(r => (r.getAs[String]("name"), r.isNullAt(r.fieldIndex("ref"))))
    assert(bucketed.toSet == Set(("e1", true), ("e2", true)))
    // and an empty LEFT side returns an empty result, not an error
    val emptyLeft = spark.createDataFrame(
      Seq.empty[(Long, java.sql.Timestamp, String)]).toDF("k", "t", "name")
    assert(AsOfJoin.asof(emptyLeft, left.select(col("k"), col("t"),
      col("k").as("ref")), "k", "k", "t", "t", Seq("ref")).isEmpty)
  }

  test("intervalOverlap == naive theta join, each pair exactly once") {
    // pseudo-random keyed intervals; spans regularly exceed the bucket
    // width so multi-bucket pairs exercise the emit-once attribution
    val rows = (0 until 300).map { i =>
      val lo = (i * 97L) % 1000
      (i % 5L, i.toLong, lo, lo + (i * 31L) % 120)
    }
    val iv = spark.createDataFrame(rows).toDF("k", "id", "lo", "hi")
    val got = RangeJoin.intervalOverlap(iv, iv, Seq("k"), "lo", "hi",
        bucketWidth = 50L)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = iv.as("a").join(iv.as("b"),
        col("a.k") === col("b.k") &&
        col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == naive.length, "a pair was emitted twice or missed")
    assert(got.toSet == naive.toSet)
    // null bounds drop the row rather than matching everything
    val withNull = spark.createDataFrame(Seq(
      (1L, 10L, Some(0L), Some(5L)), (1L, 11L, None, Some(5L))))
      .toDF("k", "id", "lo", "hi")
    assert(RangeJoin.intervalOverlap(withNull, withNull, Seq("k"),
      "lo", "hi", 10L).count() == 1L) // only (10, 10)
  }

  test("editDistanceJoin == naive levenshtein theta join, incl. short strings") {
    import graft.operators.FuzzyJoin
    // adversarial mix: near-duplicates, short strings (below the k·q+1
    // gram prefix), disjoint-gram shorts within distance k, exact dupes
    val names = Seq("red bolt", "new bolt", "red bolts", "cold anvil",
      "old anvil", "gold anvil", "ab", "xy", "abc", "abd", "a", "",
      "widget mk1", "widget mk2", "widget mk23", "totally different thing")
    val df = spark.createDataFrame(names.zipWithIndex.map {
      case (s, i) => (i.toLong, s)
    }).toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceJoin(df, "id", "s", k = k, q = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val naive = df.as("a").join(df.as("b"),
          col("a.id") < col("b.id") &&
          levenshtein(col("a.s"), col("b.s")) <= k)
        .select(col("a.id"), col("b.id"), levenshtein(col("a.s"), col("b.s")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == naive, s"k=$k: fuzzy join diverged from naive")
      assert(naive.nonEmpty, "test data must produce matches")
    }
    // "ab" vs "xy" share no gram but are within distance 2: the short
    // bucket must have caught it at k=2
    val k2 = FuzzyJoin.editDistanceJoin(df, "id", "s", k = 2, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k2.contains((names.indexOf("ab").toLong, names.indexOf("xy").toLong)))
  }

  test("banded range join buckets values with half-open intervals") {
    val facts = spark.createDataFrame(Seq(
      Tuple1(0.0), Tuple1(49.9), Tuple1(50.0), Tuple1(149.9), Tuple1(150.0)))
      .toDF("v")
    val bands = spark.createDataFrame(Seq(
      (0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e9, "high")))
      .toDF("lo", "hi", "band")
    val got = RangeJoin.banded(facts, bands, "v", "lo", "hi")
      .groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("low" -> 2L, "mid" -> 2L, "high" -> 1L))
  }
}
