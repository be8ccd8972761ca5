package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic dedup over a SEPARABLE synthetic embedding
  * space, built so every expected pair/survivor is hand-derivable with
  * zero tolerance:
  *
  *   v = cosθ·anchor + sinθ·e,  anchor ∈ basis dims 0..7 (one per group),
  *                              e = a basis dim PRIVATE to the point
  *
  * so cos(v_i, v_j) is EXACTLY cos²θ = 0.8 for distinct same-anchor
  * points, 0 across anchors (disjoint support), and 1 for planted exact
  * clones — no randomness, no boundary cases. Thresholds then select
  * structure: 0.9 sees only clones, 0.7 collapses whole anchors.
  */
class SemanticDedupSpec extends SparkSpec {

  private val CosT = math.sqrt(0.8) // cos²θ = 0.8 between same-anchor points
  private val SinT = math.sqrt(0.2)

  private def point(anchor: Int, idx: Int): Array[Float] = {
    val v = new Array[Float](64)
    v(anchor) = CosT.toFloat
    v(8 + anchor * 6 + idx) = SinT.toFloat // private dim: cross terms vanish
    v
  }

  /** 8 anchors × 6 points (ids a*100+p), exact clones of point 0 of
    * anchors 0..2 under ids a*100+10000, plus one zero vector (id 99999)
    * that must never pair and never be dropped.
    */
  private lazy val emb: DataFrame = {
    val rows =
      (for { a <- 0 until 8; p <- 0 until 6 }
        yield (a * 100L + p, point(a, p))) ++
      (0 until 3).map(a => (a * 100L + 10000L, point(a, 0))) ++
      Seq((99999L, new Array[Float](64)))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  private val clonePairs = Set((0L, 10000L), (100L, 10100L), (200L, 10200L))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ids(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("exact mode (k=1) finds exactly the planted clone pairs at 0.9") {
    val got = pairSet(Dedup.semanticPairs(emb, "vec_id", "embedding",
      threshold = 0.9, nClusters = 1))
    assert(got == clonePairs, s"got $got")
    Dedup.releaseCaches()
  }

  test("clustered mode (k=8) == exact mode: clones can never straddle a boundary") {
    // identical vectors assign to the same centroid deterministically,
    // whatever Lloyd converged to — so at a threshold only clones reach,
    // the clustered output EQUALS brute force while scoring far fewer
    // candidates (the subset assert; the equality is the recall claim)
    val exactC = Dedup.semanticCandidates(emb, "vec_id", "embedding",
      nClusters = 1).count()
    val scoped = Dedup.semanticCandidates(emb, "vec_id", "embedding",
      nClusters = 8, sampleSize = 100)
    val scopedC = scoped.count()
    assert(scopedC < exactC,
      s"cluster scoping did not reduce candidates: $scopedC vs $exactC")
    val got = pairSet(Dedup.semanticPairs(emb, "vec_id", "embedding",
      threshold = 0.9, nClusters = 8, sampleSize = 100))
    assert(got == clonePairs, s"got $got")
    Dedup.releaseCaches()
  }

  test("survivors at 0.7 collapse each anchor to its min id; zero vector survives") {
    // same-anchor cosine is exactly 0.8 ≥ 0.7, so each anchor (plus its
    // clones) is ONE component; survivor = min id = a*100. The zero
    // vector pairs with nothing (cosine undefined → filtered), survives.
    val got = ids(Dedup.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.7, nClusters = 1))
    val want = (0 until 8).map(_ * 100L).toSet + 99999L
    assert(got == want, s"got ${got.toSeq.sorted}")
    Dedup.releaseCaches()
  }

  test("partitioning invariance: survivors identical under a 7-way repartition") {
    val a = ids(Dedup.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.9, nClusters = 1))
    val b = ids(Dedup.semanticDedup(emb.repartition(7), "vec_id", "embedding",
      threshold = 0.9, nClusters = 1))
    assert(a == b)
    assert(a == (emb.collect().map(_.getLong(0)).toSet -- clonePairs.map(_._2)))
    Dedup.releaseCaches()
  }

  test("score-aware survivors keep the best-scored member per component") {
    // vec_id % 10 scores each anchor's members 0..5 and every clone 0,
    // so the survivor of each collapsed anchor is its id a*100+5
    val scored = emb.withColumn("score", col("vec_id") % 10)
    val got = ids(Dedup.semanticDedupBy(scored, "vec_id", "embedding",
      "score", threshold = 0.7, nClusters = 1))
    val want = (0 until 8).map(_ * 100L + 5L).toSet + 99999L
    assert(got == want, s"got ${got.toSeq.sorted}")
    Dedup.releaseCaches()
  }

  test("fused verify shape: vectors ride through the cluster self-join") {
    // the scoring stage consumes the self-join output in place — no
    // thin-candidates-then-re-fetch joins (the 109 s -> 21.6 s probe
    // finding). Plan-printed join count pins the shape: one assignment⋈
    // vectors join (visible twice through the cached relation's two
    // self-join branches) + the cluster self-join itself.
    val p = Dedup.semanticPairs(emb, "vec_id", "embedding",
      threshold = 0.9, nClusters = 8, sampleSize = 100)
      .queryExecution.executedPlan.toString
    val joins = "Join".r.findAllIn(p).length
    assert(joins <= 3, s"semanticPairs plans $joins joins — candidate " +
      s"re-fetch shape reintroduced?\n$p")
    Dedup.releaseCaches()
  }

  test("semanticK derivation: ⌈n/1024⌉, floored at 1") {
    assert(Dedup.semanticK(500L) == 1)
    assert(Dedup.semanticK(1024L) == 1)
    assert(Dedup.semanticK(1025L) == 2)
    assert(Dedup.semanticK(1000000L) == 977)
    assert(Dedup.semanticK(0L) == 1)
  }

  test("scale guard: auto-k candidate volume stays ~linear in n (count, not time)") {
    // isotropic pseudo-random vectors at 2k and 8k rows with a 256-target
    // cluster size: per-cluster population is held ~constant by the k
    // derivation, so candidates scale ~4x with n. A frozen k (the
    // degenerate default this guards against) holds CLUSTER COUNT
    // constant instead and lands ~16x. Same ratio-gate shape as
    // ScaleGuardSpec's SRP leg; 8x splits the two regimes.
    def vecs(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2000L)) - 1000L)
            .cast("double") / 1000.0).cast("float")).as("embedding"))
    def cands(n: Long): Long = {
      val c = Dedup.semanticCandidates(vecs(n), "vec_id", "embedding",
        nClusters = Dedup.semanticK(n, targetCluster = 256L)).count()
      Dedup.releaseCaches()
      c
    }
    val c2k = cands(2048L)
    val c8k = cands(8192L)
    assert(c2k > 0, "guard fixture produced no candidates at 2k")
    assert(c8k <= 8 * c2k,
      s"semantic candidate volume super-linear: 2k -> $c2k, 8k -> $c8k " +
        "(auto-k derivation broken or frozen)")
  }
}
