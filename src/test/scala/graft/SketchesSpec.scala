package graft

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketches at rest: per-slice HLL rows must estimate within the HLL
  * error envelope, merge LOSSLESSLY (rolled-up == direct, exactly), and
  * be insensitive to partitioning — plus survive a parquet round-trip,
  * which is the whole point of a sketch table.
  */
class SketchesSpec extends SparkSpec {

  /** (day, kind, user): 4 days × 2 kinds; user ranges overlap across
    * slices so rollups genuinely dedupe across sketches (sum-of-slices
    * would be wrong — that is what the merge must get right).
    */
  private lazy val events: DataFrame = {
    import spark.implicits._
    (0 until 20000).map { i =>
      val day = i % 4
      val kind = if (i % 2 == 0) "view" else "buy"
      // each (day, kind) slice covers an overlapping 500-user window
      (day, kind, (i * 7919 % 500) + day * 100L)
    }.toDF("day", "kind", "user_id")
  }

  private def estimates(df: DataFrame, keys: String*): Map[Seq[Any], Long] =
    df.collect().map { r =>
      keys.map(k => r.get(r.fieldIndex(k))).toSeq ->
        r.getLong(r.fieldIndex("approx_distinct"))
    }.toMap

  test("per-slice estimates land within the HLL error envelope of exact") {
    val slices = Sketches.hllByGroup(events, Seq("day", "kind"), "user_id")
    val est = estimates(
      Sketches.hllRollup(slices, Seq("day", "kind")), "day", "kind")
    val exact = events.groupBy("day", "kind")
      .agg(countDistinct("user_id").as("x")).collect()
      .map(r => Seq(r.get(0), r.get(1)) -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, e) =>
      assert(math.abs(e.toDouble - exact(k)) / exact(k) < 0.03,
        s"slice $k: estimate $e vs exact ${exact(k)}")
    }
  }

  test("rollup of slice sketches == direct sketch, EXACTLY (lossless merge)") {
    val slices = Sketches.hllByGroup(events, Seq("day", "kind"), "user_id")
    val rolled = estimates(Sketches.hllRollup(slices, Seq("kind")), "kind")
    val direct = estimates(
      Sketches.hllRollup(
        Sketches.hllByGroup(events, Seq("kind"), "user_id"), Seq("kind")),
      "kind")
    assert(rolled == direct,
      "merging slice sketches must carry the same register set as " +
        "sketching the concatenated data")
    // and the global rollup from either slicing agrees
    val g1 = Sketches.hllRollup(slices, Nil).head().getLong(0)
    val g2 = Sketches.hllRollup(
      Sketches.hllByGroup(events, Seq("day"), "user_id"), Nil)
      .head().getLong(0)
    assert(g1 == g2)
  }

  test("sketch rows survive a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString + "/t"
    Sketches.hllByGroup(events, Seq("day", "kind"), "user_id")
      .write.parquet(dir)
    val reread = spark.read.parquet(dir)
    assert(estimates(Sketches.hllRollup(reread, Seq("kind")), "kind") ==
      estimates(Sketches.hllRollup(
        Sketches.hllByGroup(events, Seq("kind"), "user_id"), Seq("kind")),
        "kind"))
  }

  test("streamed slices == batch sketch; redelivered slice rows cannot move the estimate") {
    val base = java.nio.file.Files.createTempDirectory("hllstream").toString
    // two arrival waves on disk
    events.filter(col("day") < 2).write.parquet(s"$base/in/w1")
    events.filter(col("day") >= 2).write.parquet(s"$base/in/w2")
    Sketches.hllSliceStream(
      spark.readStream.schema("day INT, kind STRING, user_id LONG")
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in/w*"),
      Seq("kind"), "user_id", s"$base/slices", s"$base/ckpt")
    val slices = spark.read.parquet(s"$base/slices")
    assert(slices.count() >= 4, "two waves x two kinds must leave >= 4 slice rows")
    val streamed = estimates(Sketches.hllRollup(slices, Seq("kind")), "kind")
    val direct = estimates(Sketches.hllRollup(
      Sketches.hllByGroup(events, Seq("kind"), "user_id"), Seq("kind")), "kind")
    assert(streamed == direct,
      "arrival form must be invisible to the rolled-up estimates")
    // at-least-once redelivery: re-append every slice row verbatim — the
    // pointwise-max union absorbs the duplicates, estimates cannot move
    slices.write.mode("append").parquet(s"$base/slices")
    assert(estimates(Sketches.hllRollup(
      spark.read.parquet(s"$base/slices"), Seq("kind")), "kind") == direct)
  }

  test("overlap estimate by inclusion-exclusion lands near truth, clamps at 0 when disjoint") {
    import spark.implicits._
    // |A| = 800, |B| = 700, true overlap 500 (users 300..799)
    val a = (0L until 800L).map(("a", _)).toDF("side", "u")
    val b = (300L until 1000L).map(("b", _)).toDF("side", "u")
    val sk = Sketches.hllByGroup(a.unionAll(b), Seq("side"), "u")
      .groupBy().pivot("side").agg(first("hll"))
    val est = sk.select(Sketches.hllOverlap(col("a"), col("b")).as("o"))
      .head().getLong(0)
    assert(math.abs(est - 500.0) / 500.0 < 0.10,
      s"overlap estimate $est vs true 500 — outside the compounded-error band")
    // disjoint: clamp, never negative
    val c = (5000L until 5800L).map(("c", _)).toDF("side", "u")
    val sk2 = Sketches.hllByGroup(a.unionAll(c), Seq("side"), "u")
      .groupBy().pivot("side").agg(first("hll"))
    val est2 = sk2.select(Sketches.hllOverlap(col("a"), col("c")).as("o"))
      .head().getLong(0)
    assert(est2 >= 0L && est2 < 40L,
      s"disjoint overlap must clamp near 0: $est2")
  }

  test("partitioning- and order-invariant: repartitioned input, identical estimates") {
    val a = estimates(Sketches.hllRollup(
      Sketches.hllByGroup(events, Seq("day"), "user_id"), Seq("day")), "day")
    val b = estimates(Sketches.hllRollup(
      Sketches.hllByGroup(events.repartition(13).sortWithinPartitions(desc("user_id")),
        Seq("day"), "user_id"), Seq("day")), "day")
    assert(a == b)
  }
}
