package graft

import graft.operators.{Indexing, Sampling}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the deterministic hash-sampling family,
  * driven by ScalaCheck generators on a FIXED seed (reproducible runs):
  * each property evaluates one generated batch through Spark and asserts
  * the operator's contract over every generated row — the guarantees the
  * scaladocs promise (monotonicity, nesting, stability) checked against
  * adversarial inputs instead of hand-picked ones.
  */
class PropertySpec extends SparkSpec {

  private val seed = Seed(42L)
  private def sample[A](g: Gen[A]): A =
    g.pureApply(Gen.Parameters.default, seed)

  private val keyGen: Gen[List[String]] =
    Gen.listOfN(400, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.asciiPrintableStr.map(_.take(16)),
      Gen.const(""),
      Gen.long.map(_.toString)))

  test("hashWeight lands in [0,1) for adversarial keys and is injective-ish") {
    import spark.implicits._
    val keys = sample(keyGen).distinct
    val ws = keys.toDF("k")
      .select(col("k"), Sampling.hashWeight(col("k")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(ws.forall { case (_, w) => w >= 0.0 && w < 1.0 })
    // md5 mixing: no mass collision among distinct keys
    assert(ws.map(_._2).distinct.length >= ws.length - 1)
  }

  test("importanceSample is monotone in the probability column") {
    import spark.implicits._
    val probs = sample(Gen.listOfN(400, Gen.chooseNum(-0.2, 1.2)))
    val df = probs.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "p")
    def kept(c: String) =
      Sampling.importanceSample(df.withColumn("p2",
        least(col("p") + 0.25, lit(1.0))), "id",
        if (c == "hi") "p2" else "p")
        .select("id").collect().map(_.getLong(0)).toSet
    assert(kept("lo").subsetOf(kept("hi")),
      "raising every row's keep probability must never drop a kept row")
  }

  test("stratifiedSample nests: a lower fraction keeps a subset, per stratum") {
    import spark.implicits._
    val fracs = sample(Gen.listOfN(5, Gen.chooseNum(0.0, 1.0)))
    val strata = ('a' to 'e').map(_.toString)
    val fmapLo = strata.zip(fracs.map(_ * 0.5)).toMap
    val fmapHi = strata.zip(fracs).toMap
    val rows = (0L until 2000L).map(i => (i, strata((i % 5).toInt)))
      .toDF("id", "s")
    val lo = Sampling.stratifiedSample(rows, "id", "s", fmapLo, 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.stratifiedSample(rows, "id", "s", fmapHi, 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
  }

  test("temperatureSample is monotone in alpha") {
    import spark.implicits._
    val sizes = sample(Gen.listOfN(4, Gen.chooseNum(50, 400)))
    val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
      (0 until n).map(i => (g * 1000L + i, s"g$g"))
    }.toDF("id", "g")
    def kept(alpha: Double) =
      Sampling.temperatureSample(rows, "g", "id", alpha)
        .select("id").collect().map(_.getLong(0)).toSet
    val a3 = kept(0.3); val a6 = kept(0.6); val a9 = kept(0.9)
    assert(a3.subsetOf(a6) && a6.subsetOf(a9),
      "higher alpha (less flattening) must keep a superset")
    assert(kept(1.0).size == rows.count())
  }

  test("kfold/hashSplit assignments never change when the corpus grows") {
    import spark.implicits._
    val keys = sample(keyGen).distinct
    val half = keys.take(keys.length / 2)
    def folds(ks: Seq[String]) =
      Sampling.kfold(ks.toDF("k"), "k", 7)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = folds(half)
    val after = folds(keys)
    assert(before.forall { case (k, f) => after(k) == f })
  }

  test("rendezvousShard growth n->n+1 only ever moves keys to the new shard") {
    import spark.implicits._
    val keys = sample(Gen.listOfN(600, Gen.long)).distinct.toDF("k")
    for (n <- 2 to 7) {
      val at = Indexing.rendezvousShard(keys, "k", n)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val next = Indexing.rendezvousShard(keys, "k", n + 1)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val moved = at.keys.filter(k => at(k) != next(k))
      assert(moved.forall(k => next(k) == n),
        s"n=$n: a key migrated between existing shards")
    }
  }

  test("runningTotal equals the window cumsum for arbitrary (incl. negative) weights") {
    import spark.implicits._
    val ws = sample(Gen.listOfN(300, Gen.chooseNum(-50L, 50L)))
    val rows = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
    val expect = rows.withColumn("cum",
        sum("w").over(org.apache.spark.sql.expressions.Window
          .orderBy("id").rowsBetween(Long.MinValue, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Sampling.runningTotal(rows.repartition(9), Seq(col("id")), "w")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }
}
