package graft

import org.apache.spark.sql.functions._

/** Tolerance bands for the sketch aggregates that have no SQL-expressible
  * oracle (declared rows-only in the driver gate): approximate answers must
  * still land within a few percent of the exact ones, so "rows-only" does
  * not mean "unchecked".
  */
class SketchSpec extends SparkSpec {

  private lazy val lineitem = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("HLL approx_count_distinct within 2% of exact cardinalities") {
    // rsd = 0.01, matching SparkEntry.qHll — the 0.05 default misses 2%.
    val row = lineitem.agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
      countDistinct("l_partkey").as("ep"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
      countDistinct("l_orderkey").as("eo")).head()
    val (ap, ep, ao, eo) =
      (row.getLong(0).toDouble, row.getLong(1).toDouble,
        row.getLong(2).toDouble, row.getLong(3).toDouble)
    assert(math.abs(ap - ep) / ep <= 0.02, s"partkey HLL off: $ap vs $ep")
    assert(math.abs(ao - eo) / eo <= 0.02, s"orderkey HLL off: $ao vs $eo")
  }

  test("percentile_approx within 2% of exact median per group") {
    val got = lineitem.groupBy("l_returnflag")
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e <= 0.02,
        s"median for ${r.getString(0)} off: approx $a vs exact $e")
    }
  }

  test("count-min sketch: estimates never undercount, overshoot bounded by eps*N") {
    val eps = 0.001
    val bytes = lineitem
      .agg(expr(s"count_min_sketch(l_returnflag, ${eps}d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = lineitem.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, true_n) =>
      val est = cms.estimateCount(k)
      assert(est >= true_n, s"CMS undercounted $k: $est < $true_n")
      assert(est <= true_n + (eps * n).toLong + 1,
        s"CMS overshot eps bound for $k: $est vs $true_n (N=$n)")
    }
  }
}
