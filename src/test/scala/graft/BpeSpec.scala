package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE training certified against a single-node reference implementation
  * of Sennrich et al.'s algorithm — same greedy-leftmost merge, same
  * (count desc, pair asc) argmax tie-break — so the distributed trainer's
  * merge table must match BIT-EXACTLY, merge for merge.
  */
class BpeSpec extends SparkSpec {

  // ---- reference single-node implementation ----
  private def refMergeWord(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(
      words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var tbl: Map[List[String], Long] =
      words.groupMapReduce(w => w._1.split("").filter(_.nonEmpty).toList)(_._2)(_ + _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (merges.length < k && continue) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      if (pairs.isEmpty) continue = false
      else {
        val ((a, b), c) = pairs.minBy { case ((l, r), n) => (-n, l, r) }
        merges += ((a, b, c))
        tbl = tbl.toSeq
          .map { case (syms, n) => (refMergeWord(syms, a, b), n) }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.toSeq
  }

  test("applyMerge is greedy leftmost: overlapping runs, no cascades") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
      Seq("c", "a", "b"), Seq("a", "b", "b"), Seq("x")).toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("aa", "a"))
    assert(got(1) == List("aa", "aa"))
    assert(got(2) == List("c", "a", "b"))
    assert(got(4) == List("x"))
    val ab = df.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(ab(2) == List("c", "ab"))
    assert(ab(3) == List("ab", "b")) // merged "ab" never re-matches as left
  }

  test("trainMerges matches the reference on the classic corpus, merge for merge") {
    import spark.implicits._
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = corpus.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val df = Seq((0L, docs)).toDF("doc_id", "text")
    val (got, _) = Bpe.trainMerges(Bpe.wordCounts(df, "text"), k = 10)
    val want = refTrain(corpus, 10)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the classic first merges: (e,s) count 9, then (es,t) count 9
    assert(got.take(2).map(m => (m._1, m._2)) == Seq(("e", "s"), ("es", "t")))
  }

  test("trainMerges matches the reference on a fixture corpus slice") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
    val wc = Bpe.wordCounts(docs, "text")
    val words = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (got, _) = Bpe.trainMerges(wc, k = 12)
    assert(got == refTrain(words, 12))
    assert(got.length == 12)
  }

  test("encode applies the merge table narrowly and preserves word order") {
    import spark.implicits._
    val df = Seq((1L, "newest lowest"), (2L, ""), (3L, "x")).toDF("id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val got = Bpe.encode(df, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("n", "e", "w", "est", "lo", "w", "est"))
    assert(got(2L) == Nil)
    assert(got(3L) == List("x"))
    // narrow: no exchange in the plan
    val plan = Bpe.encode(df, "id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
