package graft
import org.apache.spark.sql.functions._

/** The SQL MERGE star-action shapes: `UPDATE SET *` / `INSERT *` expand
  * in the ANALYZER to every-column assignments (including the no-op
  * merge-key reassignment `k = s.k`, which the translation drops), so
  * they ride the generic MergeSpec path; `WITH SCHEMA EVOLUTION` refuses
  * loudly — probed, not assumed: Spark only evolves row-level-operation
  * targets, so honoring the clause would silently not evolve.
  */
class MergeStarSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE star actions: SET * / INSERT * route through MergeSpec; WITH SCHEMA EVOLUTION refuses") {
    val wh = java.nio.file.Files.createTempDirectory("merge_star").toString
    spark.conf.set("spark.sql.catalog.mstar",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mstar.warehouse", wh)
    spark.sql("CREATE TABLE mstar.t (k BIGINT, v DOUBLE, u STRING) " +
      "OPTIONS (zoneCols 'k')")
    (0L until 20L).map(k => (k, k * 2.0, s"u$k")).toDF("k", "v", "u")
      .createOrReplaceTempView("mstar_src0")
    spark.sql("INSERT INTO mstar.t SELECT * FROM mstar_src0")
    (10L until 30L).map(k => (k, k * 100.0, s"p$k")).toDF("k", "v", "u")
      .createOrReplaceTempView("mstar_src1")
    spark.sql("""MERGE INTO mstar.t AS t USING mstar_src1 AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT COUNT(*) FROM mstar.t").head.getLong(0) == 30)
    assert(spark.sql("SELECT SUM(v) FROM mstar.t WHERE k >= 10").head
      .getDouble(0) == (10L until 30L).map(_ * 100.0).sum,
      "matched rows take the full star image; unmatched insert it")
    assert(spark.sql("SELECT COUNT(*) FROM mstar.t WHERE k < 10 AND " +
      "u NOT LIKE 'u%'").head.getLong(0) == 0,
      "unmatched stored rows ride through")
    // WITH SCHEMA EVOLUTION refuses loudly instead of silently dropping
    // the source-only column from the star expansion
    (0L until 5L).map(k => (k, 1.0, "x", k * 1.0)).toDF("k", "v", "u", "w")
      .createOrReplaceTempView("mstar_src2")
    val e = intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mstar.t AS t
        USING mstar_src2 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""") }
    assert(e.getMessage.contains("SCHEMA EVOLUTION"), e.getMessage)
    // a non-no-op key reassignment still refuses
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO mstar.t AS t USING mstar_src1 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET k = s.k + 1, v = s.v""") }
    assert(e2.getMessage.contains("reassign merge key"), e2.getMessage)
  }
}
