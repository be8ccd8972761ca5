package graft

import graft.operators.{Dedup, Indexing, Sampling}
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

  test("semanticDedup(k=1) == min-id closure over brute-force cosine pairs on adversarial vectors") {
    import spark.implicits._
    // generated corpus with the hostile shapes: random directions, exact
    // clones, SCALED copies (cosine exactly 1 up to fp — a semantic dup
    // the magnitude-blind metric must catch), and zero vectors
    val dim = 8
    val raws = sample(Gen.listOfN(60,
      Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0).map(_.toFloat))))
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val clones = raws.take(6).map { case (id, v) => (id + 1000L, v.clone) }
    val scaled = raws.slice(6, 12).map { case (id, v) =>
      (id + 2000L, v.map(x => x * 2.0f))
    }
    val zeros = Seq((3000L, new Array[Float](dim)), (3001L, new Array[Float](dim)))
    val all = raws ++ clones ++ scaled ++ zeros
    val emb = all.toDF("vec_id", "embedding")
    val threshold = 0.8
    // in-test oracle mirrors the kernel's exact accumulation order
    // (one pass, denom = sqrt(na)*sqrt(nb), zero denom -> 0.0), so the
    // threshold decision is bit-identical and the equality is exact
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    all.foreach { case (id, _) => parent(id) = id }
    for {
      (i, vi) <- all; (j, vj) <- all if i < j
      if cos(vi, vj) >= threshold
    } {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) { if (ri < rj) parent(rj) = ri else parent(ri) = rj }
    }
    val want = all.map(_._1).filter(id => find(id) == id).toSet
    val got = Dedup.semanticDedup(emb.repartition(5), "vec_id", "embedding",
      threshold = threshold, nClusters = 1)
      .collect().map(_.getLong(0)).toSet
    Dedup.releaseCaches()
    assert(got == want,
      s"missing=${(want -- got).toSeq.sorted} extra=${(got -- want).toSeq.sorted}")
    // the zero vectors must be among the survivors (they pair with nothing)
    assert(got.contains(3000L) && got.contains(3001L))
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
