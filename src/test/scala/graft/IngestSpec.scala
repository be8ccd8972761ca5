package graft

import graft.operators.Ingest

class IngestSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert: batch wins on collision, untouched base rows survive") {
    val base = corpus(1L -> "a", 2L -> "b", 3L -> "c")
    val batch = corpus(2L -> "B", 4L -> "D")
    val out = asMap(Ingest.upsert(base, batch, Seq("id")))
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val base = corpus(1L -> "a", 2L -> "b")
    val batch = corpus(2L -> "B", 3L -> "C")
    val once = Ingest.upsert(base, batch, Seq("id"))
    val twice = Ingest.upsert(once, batch, Seq("id"))
    assert(asMap(once) == asMap(twice))
  }

  test("upsert with empty batch returns the base rows") {
    val base = corpus(1L -> "a")
    val out = asMap(Ingest.upsert(base, corpus(), Seq("id")))
    assert(out == Map(1L -> "a"))
  }

  test("upsert rejects an empty key list") {
    val df = corpus(1L -> "a")
    intercept[IllegalArgumentException](Ingest.upsert(df, df, Seq.empty))
  }
}
