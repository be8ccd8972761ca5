package graft

import graft.operators.SeriesSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subsequence search: z-norm invariance (the semantic point), exact
  * chunked == unchunked equality (the scale point), deterministic
  * series assembly, and degenerate-window safety.
  */
class SeriesSearchSpec extends SparkSpec {

  private val pattern = Array(1.0, 3.0, 2.0, 5.0, 4.0)

  /** Three series: key 1 embeds an exact affine copy of the pattern
    * (y = 3x + 7) at offset 4; key 2 is noise-ish; key 3 is flat.
    */
  private lazy val series: DataFrame = {
    import spark.implicits._
    val s1 = Array(9.0, 8.0, 7.0, 6.0) ++ pattern.map(3.0 * _ + 7.0) ++
      Array(0.0, 2.0)
    val s2 = Array(5.0, 1.0, 5.0, 1.0, 5.0, 1.0, 5.0, 1.0, 5.0, 1.0)
    val s3 = Array.fill(9)(4.2)
    Seq((1L, s1), (2L, s2), (3L, s3)).toDF("key", "xs")
  }

  private def rows(df: DataFrame): Seq[(Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

  test("an affine copy of the pattern is distance ~0 and ranks first") {
    val top = rows(SeriesSearch.topK(series, "key", pattern, 3))
    assert(top.head._1 == 1L && top.head._2 == 4,
      s"nearest window must be the planted affine copy: $top")
    assert(top.head._3 < 1e-6, s"affine copy must z-norm to distance 0: $top")
    assert(top(1)._3 > 0.5, "nothing else in the fixture resembles the pattern")
  }

  test("flat windows score sqrt(m) against any query, never NaN") {
    val d = rows(SeriesSearch.slidingZDist(series, "key", pattern))
      .filter(_._1 == 3L)
    assert(d.size == 9 - pattern.length + 1)
    d.foreach { case (_, _, dist) =>
      assert(!dist.isNaN)
      assert(math.abs(dist - math.sqrt(pattern.length)) < 1e-9,
        s"flat window distance must be |z(q)| = sqrt(m): $dist")
    }
  }

  test("series shorter than the pattern contribute nothing") {
    import spark.implicits._
    val short = Seq((9L, Array(1.0, 2.0))).toDF("key", "xs")
    assert(SeriesSearch.slidingZDist(short, "key", pattern).count() == 0)
  }

  test("chunked scan == unchunked scan, bit-exactly, at every chunk size") {
    // sorted Seq, NOT Set: a double-scored overlap window would emit a
    // bit-identical duplicate row that a set comparison cannot see
    val full = rows(SeriesSearch.slidingZDist(series, "key", pattern)).sorted
    for (chunk <- Seq(5, 6, 7, 100, Int.MaxValue)) {
      val ch = rows(SeriesSearch.chunkedZDist(series, "key", pattern, chunk)).sorted
      assert(ch == full, s"chunk=$chunk diverged from the unchunked scan")
    }
  }

  test("non-integral series keys are refused loudly, not silently merged") {
    import spark.implicits._
    val bad = Seq(("doc_a", Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)))
      .toDF("key", "xs")
    val e = intercept[IllegalArgumentException] {
      SeriesSearch.slidingZDist(bad, "key", pattern)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("seriesOf assembles a deterministic order under any partitioning") {
    import spark.implicits._
    val pts = (0 until 40).map(i => (i % 3L, i / 3, (i * 37 % 11).toDouble))
      .toDF("key", "t", "v")
    def xs(df: DataFrame): Map[Long, Seq[Double]] =
      SeriesSearch.seriesOf(df, "key", Seq("t"), "v").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val a = xs(pts)
    assert(a == xs(pts.repartition(7)))
    // and the order really is by t
    assert(a(0L) == (0 until 40).filter(_ % 3 == 0).map(i => (i * 37 % 11).toDouble))
  }

  test("scanStream: a three-wave point stream scores exactly the batch windows, at true offsets") {
    import spark.implicits._
    // two series of 23 points each, split into waves of 9/8/6 points —
    // every wave boundary slices windows (m=5), so cross-boundary
    // completion is exercised on both keys; key 2 skips wave 2 entirely
    val pts = (0 until 23).flatMap { t =>
      Seq((1L, t, math.sin(t * 0.7) * 3 + t % 5),
        (2L, t, (t * 37 % 11).toDouble))
    }.toDF("key", "t", "v")
    val base = java.nio.file.Files.createTempDirectory("sscan").toString
    // ONE file per wave: the stream feeds a file per micro-batch, and a
    // multi-part wave would scatter each wave's time range across
    // batches — violating the per-key order contract the operator states
    pts.filter(col("t") < 9).coalesce(1).write.parquet(s"$base/in/w1")
    pts.filter(col("t") >= 9 && col("t") < 17 && col("key") === 1)
      .coalesce(1).write.parquet(s"$base/in/w2")
    pts.filter(col("t") >= 17 ||
        (col("t") >= 9 && col("t") < 17 && col("key") === 2))
      .coalesce(1).write.parquet(s"$base/in/w3")
    // mtime order IS arrival order for FileStreamSource — pin it so three
    // writes inside one mtime tick can't be picked up swapped
    SeriesSearch.pinArrivalOrder(spark, (1 to 3).map(i => s"$base/in/w$i"))
    SeriesSearch.scanStream(
      spark.readStream.schema("key LONG, t INT, v DOUBLE")
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in/w*"),
      "key", Seq("t"), "v", pattern,
      s"$base/out", s"$base/state", s"$base/ck")
    val streamed = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sorted
    val batch = SeriesSearch.slidingZDist(
      SeriesSearch.seriesOf(pts, "key", Seq("t"), "v"), "key", pattern)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq.sorted
    assert(streamed == batch,
      "cumulative streamed windows must equal the batch scan bit-for-bit")
    // (wave 3 carries key 2's t in [9,17) together with t >= 17 — the
    // per-key order contract holds because both ranges arrive in ONE
    // micro-batch and seriesOf sorts within the batch)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/state"))
      .map(_.getPath.getName).filter(_.startsWith("state-v"))
    assert(versions.length <= 2,
      s"superseded state versions must be pruned: ${versions.toSeq}")
  }

  test("scanStream redelivery: a re-run batch re-reads v{batchId-1} state and re-appends byte-identical rows") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sredeliver").toString
    val w1 = (0 until 9).map(t => (1L, t, (t * 37 % 11).toDouble)).toDF("key", "t", "v")
    val w2 = (9 until 16).map(t => (1L, t, (t * 53 % 13).toDouble)).toDF("key", "t", "v")
    def out() = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    SeriesSearch.scanBatch(w1, 0L, "key", Seq("t"), "v", pattern,
      s"$base/out", s"$base/state")
    SeriesSearch.scanBatch(w2, 1L, "key", Seq("t"), "v", pattern,
      s"$base/out", s"$base/state")
    val once = out().sorted
    // at-least-once: batch 1 crashes after its work but before the
    // checkpoint commit, and is re-delivered — the versioned state makes
    // the re-run read the SAME v0 input state, so the appended rows are
    // byte-identical duplicates (dedupe on read), never offset-shifted
    // rows scored against the post-update v1 state
    SeriesSearch.scanBatch(w2, 1L, "key", Seq("t"), "v", pattern,
      s"$base/out", s"$base/state")
    val twice = out().sorted
    assert(twice.distinct.sorted == once,
      "redelivery must re-append byte-identical rows only")
    assert(twice.size == once.size + (once.size - (9 - pattern.length + 1)),
      "the redelivered batch's rows must appear exactly twice")
    // and the stream continues correctly after the redelivery
    val w3 = (16 until 20).map(t => (1L, t, t.toDouble)).toDF("key", "t", "v")
    SeriesSearch.scanBatch(w3, 2L, "key", Seq("t"), "v", pattern,
      s"$base/out", s"$base/state")
    val all = (0 until 20).map(t =>
      (1L, t, if (t < 9) (t * 37 % 11).toDouble
        else if (t < 16) (t * 53 % 13).toDouble else t.toDouble))
      .toDF("key", "t", "v")
    val batch = SeriesSearch.slidingZDist(
      SeriesSearch.seriesOf(all, "key", Seq("t"), "v"), "key", pattern)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(out().distinct.sorted == batch.sorted)
  }

  test("topK is deterministic with (key, off) tie-break and k-bounded") {
    val top = rows(SeriesSearch.topK(series, "key", pattern, 4))
    assert(top.size == 4)
    assert(top == top.sortBy(t => (t._3, t._1, t._2)))
  }
}
