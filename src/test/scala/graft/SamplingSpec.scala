package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic hash-split invariants: stability under reshuffle and
  * corpus growth (the properties randomSplit lacks), plus fraction
  * accuracy on a large keyspace.
  */
class SamplingSpec extends SparkSpec {

  test("hash split is stable across repartitioning and corpus growth") {
    import spark.implicits._
    val base = (0L until 2000L).toDF("id")
    def labels(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "id", 0.8)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = labels(base)
    val b = labels(base.repartition(17))
    assert(a == b, "split must not depend on partitioning")
    // growing the corpus never migrates an existing key's split
    val grown = labels((0L until 4000L).toDF("id"))
    assert(a.forall { case (k, v) => grown(k) == v })
  }

  test("hash split fraction lands near the requested trainFrac") {
    import spark.implicits._
    val n = 20000L
    val counts = Sampling.hashSplit((0L until n).toDF("id"), "id", 0.75)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = counts("train").toDouble / n
    assert(math.abs(frac - 0.75) < 0.01, s"train fraction $frac too far from 0.75")
    assert(counts("train") + counts("val") == n)
  }
}
