package graft

import graft.operators.QualityModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality filter: logistic GD on hashed bag-of-words must
  * learn a planted separable rule exactly, deterministically, under any
  * partitioning — and score as a narrow pass.
  */
class QualityModelSpec extends SparkSpec {

  /** 400 docs of shared filler; label-1 docs carry the marker token.
    * Filler varies per doc so the learner can't shortcut on anything
    * but the marker.
    */
  private lazy val docs: DataFrame = {
    import spark.implicits._
    (0L until 400L).map { i =>
      val filler = s"tok${i % 7} tok${i % 5} common tok${i % 11} tok${i % 3}"
      val text = if (i % 3 == 0) s"$filler goodsignal $filler" else s"$filler $filler"
      (i, text, if (i % 3 == 0) 1 else 0)
    }.toDF("doc_id", "text", "label")
  }

  private def preds(df: DataFrame): Map[Long, Int] =
    df.select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("learns a planted separable rule to 100% training accuracy") {
    val m = QualityModel.train(docs, "doc_id", "text", "label")
    val got = preds(QualityModel.score(docs, "doc_id", "text", m))
    val want = (0L until 400L).map(i => i -> (if (i % 3 == 0) 1 else 0)).toMap
    assert(got == want)
  }

  test("bit-deterministic and partitioning-invariant: id-sorted sample fixes the float order") {
    val m1 = QualityModel.train(docs, "doc_id", "text", "label")
    val m2 = QualityModel.train(docs.repartition(7), "doc_id", "text", "label")
    assert(m1.bias == m2.bias)
    assert(java.util.Arrays.equals(m1.weights, m2.weights),
      "weights differ across partitionings")
  }

  test("sample-bounded training still generalizes the planted rule to held-out docs") {
    // ~35% id-hash sample; the rule is carried by one token, so the
    // held-out 65% must score correctly too — training cost is
    // sample-bounded at any corpus size, which is the 100 TB contract
    val m = QualityModel.train(docs, "doc_id", "text", "label",
      sampleSize = 140)
    val got = preds(QualityModel.score(docs, "doc_id", "text", m))
    assert(got == (0L until 400L).map(i => i -> (if (i % 3 == 0) 1 else 0)).toMap)
  }

  test("save/open round-trip scores identically; meta wins over nothing (no args to guess)") {
    val m = QualityModel.train(docs, "doc_id", "text", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_qm").toString
    QualityModel.save(spark, m, dir)
    val re = QualityModel.open(spark, dir)
    assert(re.dims == m.dims && re.bias == m.bias && re.seed == m.seed)
    assert(java.util.Arrays.equals(re.weights, m.weights))
  }

  test("null and empty text score as bias-only rows, no crash") {
    import spark.implicits._
    val m = QualityModel.train(docs, "doc_id", "text", "label")
    val odd = Seq((1000L, null.asInstanceOf[String]), (1001L, ""),
      (1002L, "   ")).toDF("doc_id", "text")
    val rows = QualityModel.score(odd, "doc_id", "text", m).collect()
    assert(rows.length == 3)
    val pBias = m.prob("") // bias-only: no tokens contribute
    rows.foreach(r => assert(r.getDouble(1) == pBias))
  }

  test("score is one narrow pass: zero exchanges") {
    val m = QualityModel.train(docs, "doc_id", "text", "label")
    val p = QualityModel.score(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
