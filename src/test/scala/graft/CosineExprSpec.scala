package graft

import graft.functions.{VectorOps => V}
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The fused native CosineSimilarity expression must agree bit-for-bit with
  * the composable higher-order-function form on random vectors, via both
  * the Column API and SQL registration.
  */
class CosineExprSpec extends SparkSpec {

  test("native expression == HOF cosine on random float vectors") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("id", "a", "b")
    val diffs = df.select(
        GraftFunctions.cosine(col("a"), col("b")).as("native"),
        V.cosine(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diffs.count() == 0)
  }

  test("edge cases: zero vector, empty arrays, mixed element types") {
    val df = spark.createDataFrame(Seq(
      (Array(0f, 0f), Array(1f, 2f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f))))
      .toDF("a", "b")
    val got = df.select(GraftFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0 && got(1) == 0.0 && math.abs(got(2) - 1.0) < 1e-12)
    // float array vs double literal array (mixed types)
    val mixed = df.limit(1).select(GraftFunctions.cosine(
      typedlit(Seq(1.0, 0.0)), typedlit(Seq(1.0f, 0.0f))).as("c")).head().getDouble(0)
    assert(math.abs(mixed - 1.0) < 1e-12)
  }

  test("null elements: native kernel null-propagates exactly like the HOF form") {
    val rows: Seq[(Array[java.lang.Double], Array[java.lang.Double])] = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](null, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val got = df.select(
        GraftFunctions.cosine(col("a"), col("b")).as("native"),
        V.cosine(col("a"), col("b")).as("hof"))
      .collect()
    got.take(2).foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), s"expected NULL==NULL, got $r")
    }
    assert(!got(2).isNullAt(0) && got(2).getDouble(0) == got(2).getDouble(1))
  }

  test("SQL registration: graft_cosine callable from SQL text") {
    GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb_cos_test")
    val r = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb_cos_test a JOIN emb_cos_test b ON a.vec_id = 0 AND b.vec_id = 1
        |""".stripMargin).head().getDouble(0)
    assert(r >= -1.0 && r <= 1.0 && r != 0.0)
  }
}
