package graft

import graft.operators.{Ingest, Packing, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the newest operators: each
  * scaladoc's scale claim (narrow / single shuffle / broadcast side)
  * checked against what the planner actually emits, so a refactor that
  * silently introduces an extra exchange fails CI, not a 100 TB run.
  */
class PlanShapeSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 200L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("doc_id", "text")
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(plan(df)).length

  test("slidingChunks is fully narrow: zero exchanges") {
    assert(exchanges(Packing.slidingChunks(docs, "doc_id", "text", 4, 3)) == 0)
  }

  test("cooccurrence shuffles exactly once (the count aggregate)") {
    assert(exchanges(TextAnalysis.cooccurrence(docs, "text", 3)) == 1)
  }

  test("tableDigest shuffles exactly once, pre-reduced map-side") {
    val p = plan(Ingest.tableDigest(docs, Seq.empty, Seq("doc_id", "text")))
    assert("Exchange".r.findAllIn(p).length == 1)
    // partial + final aggregate pair = map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
  }

  test("encode probes the vocabulary via broadcast, not a shuffle join") {
    val vocab = TextAnalysis.buildVocab(docs, "text", 5)
    val p = plan(TextAnalysis.encode(docs, "doc_id", "text", vocab))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("winsorize joins the cap table via broadcast") {
    import org.apache.spark.sql.functions.col
    val grouped = docs.withColumn("g", col("doc_id") % 5)
    val p = plan(Sampling.winsorize(grouped, Seq("g"), "doc_id", 0.9))
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
