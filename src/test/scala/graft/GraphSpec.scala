package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) =
    spark.createDataFrame(pairs).toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pageRank one round matches the hand-computed recurrence") {
    // 1->2, 1->3, 2->3, 3->1: n=3, r0=1/3, deg(1)=2.
    val pr = ranks(Graph.pageRank(edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L),
      "src", "dst", iterations = 1))
    val base = 0.15 / 3
    assert(math.abs(pr(1L) - (base + 0.85 * (1.0 / 3))) < 1e-12)
    assert(math.abs(pr(2L) - (base + 0.85 * (1.0 / 6))) < 1e-12)
    assert(math.abs(pr(3L) - (base + 0.85 * (1.0 / 6 + 1.0 / 3))) < 1e-12)
    // no dangling nodes: total rank mass is conserved
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
  }

  test("pageRank drops dangling mass (documented convention)") {
    val pr = ranks(Graph.pageRank(edges(1L -> 2L), "src", "dst", iterations = 1))
    assert(math.abs(pr(1L) - 0.075) < 1e-12)
    assert(math.abs(pr(2L) - (0.075 + 0.85 * 0.5)) < 1e-12)
    assert(pr.values.sum < 1.0)
  }

  test("pageRank ignores duplicate edges and self-loops") {
    val noisy = edges(1L -> 2L, 1L -> 2L, 1L -> 1L, 2L -> 2L, 2L -> 1L)
    val clean = edges(1L -> 2L, 2L -> 1L)
    assert(ranks(Graph.pageRank(noisy, "src", "dst", 3)) ==
      ranks(Graph.pageRank(clean, "src", "dst", 3)))
  }

  test("pageRank deep iteration reaches the star graph's fixed point") {
    // pure star: leaves send everything to the hub and receive nothing, so
    // from round 2 on the ranks are exactly stationary (no cycle to
    // oscillate): leaf = base, hub = base + d·3·base.
    val star = edges(2L -> 1L, 3L -> 1L, 4L -> 1L)
    val pr = ranks(Graph.pageRank(star, "src", "dst", iterations = 10))
    val base = 0.15 / 4
    assert(math.abs(pr(2L) - base) < 1e-12)
    assert(math.abs(pr(1L) - (base + 0.85 * 3 * base)) < 1e-12)
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L)) // symmetric leaves exactly equal
  }

  private def tris(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.triangleCounts(edges(pairs: _*), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts: K3 and K4 hand-checks") {
    assert(tris(1L -> 2L, 2L -> 3L, 1L -> 3L) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // K4: each vertex sits in C(3,2) = 3 triangles
    assert(tris(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts ignores direction, duplicates, and self-loops") {
    // same triangle stated redundantly in both directions + noise
    assert(tris(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 2L -> 2L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: triangle-free graphs produce no rows") {
    assert(tris(1L -> 2L, 2L -> 3L, 3L -> 4L).isEmpty) // path
    assert(tris(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L).isEmpty) // 4-cycle
  }

  test("triangleCounts: vertex in two edge-disjoint triangles counts both") {
    val m = tris(1L -> 2L, 2L -> 3L, 1L -> 3L, 1L -> 4L, 4L -> 5L, 1L -> 5L)
    assert(m == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("triangleCounts is invariant to input partitioning") {
    // coprime moduli: by CRT every (i%13, i%17) combination appears, so
    // the graph contains K13 and is triangle-rich (a single-modulus
    // polynomial pair collapses to a sparse functional graph)
    val pairs = (0L until 400L).map(i => (i % 13, i % 17))
    val df = spark.createDataFrame(pairs).toDF("src", "dst")
    def counts(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Graph.triangleCounts(d, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = counts(df)
    assert(a.nonEmpty)
    assert(counts(df.repartition(13)) == a)
  }

  test("degrees outer-merges sources and sinks") {
    val d = Graph.degrees(edges(1L -> 2L, 1L -> 3L, 2L -> 3L), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d(1L) == ((2L, 0L)))
    assert(d(2L) == ((1L, 1L)))
    assert(d(3L) == ((0L, 2L)))
  }
}
