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

  test("MG at capacity: slice summaries + rollup == exact counts (the oracle regime)") {
    val slices = Sketches.mgByGroup(events, Seq("day", "kind"), "user_id",
      k = 4096)
    val rolled = Sketches.mgRollup(slices, Seq("kind"), "user_id", k = 4096)
    val got = rolled.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val want = events.groupBy("kind", "user_id")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == want,
      "with counters >= distinct items the summary IS the count table")
  }

  test("continuous top-k composition: ledgered counts + read-time compression, redelivery absorbed") {
    // the stream_mg_topk shape with the ledger driven directly: fold the
    // corpus in two batches, REDELIVER one, compress at read — MG merges
    // by sum, so only the exactly-once ledger keeps replay from
    // double-counting (the composition mgRollup's doc prescribes)
    val path = java.nio.file.Files.createTempDirectory("mg_ledger").toString
    val m = graft.operators.MaterializedAgg.build(
      events.filter(lit(false)), Seq("day", "kind", "user_id"),
      Seq.empty, path)
    m.update(events.filter(col("day") < 2), 0L)
    m.update(events.filter(col("day") >= 2), 1L)
    m.update(events.filter(col("day") >= 2), 1L) // redelivery: ledger no-op
    val rolled = Sketches.mgRollup(
      m.read().select(col("day"), col("kind"), col("user_id"),
        col("n").as("mg_count")),
      Seq("kind"), "user_id", k = 4096)
    val got = rolled.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val want = events.groupBy("kind", "user_id")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == want,
      "ledgered fold + compression must equal the direct exact counts")
  }

  test("MG under pressure: never overcounts, misses nothing above n/(k+1), error bounded") {
    import spark.implicits._
    // one group: a=50, b=30, c=10, plus 20 singletons; k=2 => decrement by
    // the 3rd-largest (10): a->40, b->20 survive
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c") ++
      (0 until 20).map(i => s"s$i")
    val df = items.map(("g", _)).toDF("grp", "item")
    val n = items.length
    val k = 2
    val mg = Sketches.mgByGroup(df, Seq("grp"), "item", k).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(mg == Map("a" -> 40L, "b" -> 20L),
      s"hand-computed MG state (decrement by the (k+1)-th largest): $mg")
    val truth = items.groupBy(identity).map { case (i, xs) => (i, xs.length.toLong) }
    mg.foreach { case (i, c) =>
      assert(c <= truth(i), s"$i: mg $c overcounts true ${truth(i)}")
      assert(truth(i) - c <= n / (k + 1), s"$i: error beyond n/(k+1)")
    }
    truth.filter(_._2 > n.toDouble / (k + 1)).keys.foreach(i =>
      assert(mg.contains(i), s"heavy hitter $i (> n/(k+1)) was lost"))
  }

  test("MG rollup is the mergeable-summaries merge: bounds hold across lossy slices") {
    import spark.implicits._
    // two slices with disjoint tails; 'hot' is heavy in both
    val s1 = Seq.fill(40)("hot") ++ Seq.fill(12)("w1") ++ (0 until 8).map(i => s"x$i")
    val s2 = Seq.fill(35)("hot") ++ Seq.fill(15)("w2") ++ (0 until 10).map(i => s"y$i")
    val df = (s1.map(("d1", "g", _)) ++ s2.map(("d2", "g", _)))
      .toDF("day", "grp", "item")
    val k = 2
    val rolled = Sketches.mgRollup(
      Sketches.mgByGroup(df, Seq("day", "grp"), "item", k),
      Seq("grp"), "item", k).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    val n = s1.length + s2.length
    val truth = (s1 ++ s2).groupBy(identity)
      .map { case (i, xs) => (i, xs.length.toLong) }
    rolled.foreach { case (i, c) =>
      assert(c <= truth(i), s"$i: rolled mg $c overcounts true ${truth(i)}")
      assert(truth(i) - c <= n / (k + 1),
        s"$i: rolled error ${truth(i) - c} beyond n/(k+1) = ${n / (k + 1)}")
    }
    truth.filter(_._2 > n.toDouble / (k + 1)).keys.foreach(i =>
      assert(rolled.contains(i), s"heavy hitter $i lost in the rollup"))
  }

  test("MG determinism: ties at the cut resolve symmetrically, any partitioning") {
    import spark.implicits._
    // a and b tie at the kept boundary: the decrement uses the COUNT
    // value, so the outcome is symmetric in the tied items — both kept
    // at 5-2=3 — and a three-way tie at k=2 correctly wipes all three
    // (none exceeds n/(k+1): losing them is within the MG contract)
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c"))
      .map(("g", _)).toDF("grp", "item")
    val mg = Sketches.mgByGroup(df, Seq("grp"), "item", k = 2)
      .orderBy("item").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(mg == Seq(("a", 3L), ("b", 3L)), s"boundary tie: $mg")
    val mg2 = Sketches.mgByGroup(df.repartition(7), Seq("grp"), "item", k = 2)
      .orderBy("item").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(mg2 == mg, "pure function of the counts under any partitioning")
    val wiped = Sketches.mgByGroup(
      (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c") ++
        Seq.fill(2)("z")).map(("g", _)).toDF("grp", "item"),
      Seq("grp"), "item", k = 2).count()
    assert(wiped == 0, "a full tie at the cut decrements everything away")
  }

  test("partitioning- and order-invariant: repartitioned input, identical estimates") {
    val a = estimates(Sketches.hllRollup(
      Sketches.hllByGroup(events, Seq("day"), "user_id"), Seq("day")), "day")
    val b = estimates(Sketches.hllRollup(
      Sketches.hllByGroup(events.repartition(13).sortWithinPartitions(desc("user_id")),
        Seq("day"), "user_id"), Seq("day")), "day")
    assert(a == b)
  }

  // ------------------------------------------------------ moments sketch --

  test("moments histogram semantics: underflow, interior edges, overflow, nulls") {
    import spark.implicits._
    // domain [0, 10), 5 bins of width 2: -1→under, 0→b1, 1.9→b1, 2→b2,
    // 9.99→b5, 10→over, null→nowhere (and excluded from n/s/s2)
    val df = Seq(Some(-1.0), Some(0.0), Some(1.9), Some(2.0), Some(9.99),
      Some(10.0), None).map(("g", _)).toDF("g", "v")
    val m = Sketches.momentsByGroup(df, Seq("g"), "v", 0.0, 10.0, 5)
      .collect()(0)
    assert(m.getAs[Long]("n") == 6)
    assert(m.getAs[Double]("mn") == -1.0 && m.getAs[Double]("mx") == 10.0)
    assert(m.getAs[scala.collection.Seq[Long]]("hist").toSeq ==
      Seq(1L, 2L, 1L, 0L, 0L, 1L, 1L))
  }

  test("moments rollup == direct computation, bit-exact on an integer domain") {
    val docs = Tables.load(spark, sfDir, "documents")
    val slices = Sketches.momentsByGroup(
      docs, Seq("lang", "source"), "n_chars", 0.0, 2000.0, 8)
    val rolled = Sketches.momentsRollup(slices, Seq("lang"), 8)
      .orderBy("lang").collect().toSeq
    val direct = Sketches.momentsByGroup(docs, Seq("lang"), "n_chars",
        0.0, 2000.0, 8)
      .orderBy("lang").collect().toSeq
    // integer Σv/Σv² under 2^53 are exact doubles and float addition of
    // exact integers is order-free — so this is ==, not ≈
    assert(rolled.map(_.toSeq) == direct.map(_.toSeq))
    assert(rolled.nonEmpty)

    // a mismatched bins fails loudly instead of reinterpreting buckets
    val e = intercept[IllegalArgumentException] {
      Sketches.momentsRollup(slices, Seq("lang"), bins = 6)
    }
    assert(e.getMessage.contains("bins must match"))

    // and the global rollup (Nil) folds everything to one row
    val g = Sketches.momentsStats(Sketches.momentsRollup(slices, Nil, 8))
      .collect()(0)
    assert(g.getAs[Long]("n") == docs.filter(col("n_chars").isNotNull).count())
    val vals = docs.filter(col("n_chars").isNotNull)
      .select(col("n_chars").cast("double")).collect().map(_.getDouble(0))
    assert(g.getAs[Double]("mean") == vals.sum / vals.length)
  }
}
