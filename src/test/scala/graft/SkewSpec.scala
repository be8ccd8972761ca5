package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals plain equi-join on skewed data") {
    // heavily skewed fact side: 90% of rows share one key
    val rnd = new scala.util.Random(5)
    val facts = spark.createDataFrame(
      (0 until 5000).map(i => (i.toLong, if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(100).toLong)))
      .toDF("row_id", "k")
    val build = spark.createDataFrame((0L until 100L).map(k => (k, s"dim$k")))
      .toDF("bk", "label")
    val plain = facts.join(build, col("k") === col("bk"))
      .select("row_id", "label")
    val salted = Skew.saltedJoin(facts, build, "k", "bk", salts = 8)
      .select("row_id", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join works when fact and build key columns share a name") {
    val facts = spark.createDataFrame((0 until 1000).map(i => (i.toLong, i.toLong % 20)))
      .toDF("row_id", "k")
    val build = spark.createDataFrame((0L until 20L).map(k => (k, s"dim$k")))
      .toDF("k", "label")
    val plain = facts.join(build, facts("k") === build("k"))
      .select("row_id", "label")
    val salted = Skew.saltedJoin(facts, build, "k", "k", salts = 4)
      .select("row_id", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val facts = spark.createDataFrame((0 until 100).map(i => (i.toLong, i.toLong % 30)))
      .toDF("row_id", "k")
    val build = spark.createDataFrame((0L until 10L).map(k => (k, s"dim$k")))
      .toDF("bk", "label")
    val plain = facts.join(build, col("k") === col("bk"), "left")
      .select("row_id", "label")
    val salted = Skew.saltedJoin(facts, build, "k", "bk", salts = 4, joinType = "left")
      .select("row_id", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
