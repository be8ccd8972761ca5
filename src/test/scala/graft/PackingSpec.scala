package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence-packing invariants that the SQL oracle (which replays the same
  * arithmetic) cannot certify on its own: bin-level feasibility of the
  * next-fit layout and its independence from physical partitioning.
  */
class PackingSpec extends SparkSpec {

  private def docs = {
    // deterministic corpus: doc i has (i*7 % 40 + 1) tokens, some oversized
    import spark.implicits._
    (0L until 300L).map { i =>
      val n = if (i % 91 == 13) 700 else (i * 7 % 40 + 1).toInt
      (i, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("nextFitBins: every bin fits the capacity unless a single oversized doc") {
    val bins = Packing.nextFitBins(docs, "doc_id", "text", nShards = 4, capacity = 64)
    val byBin = bins.groupBy("shard", "bin")
      .agg(sum("tok").as("fill"), count(lit(1)).as("n"), max("tok").as("mx"))
      .collect()
    assert(byBin.nonEmpty)
    byBin.foreach { r =>
      val fill = r.getLong(2); val n = r.getLong(3); val mx = r.getLong(4)
      assert(fill <= 64 || (n == 1 && mx > 64),
        s"bin over capacity without being a singleton oversize: $r")
    }
    // bin ids are contiguous from 0 within each shard
    val perShard = bins.groupBy("shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nd")).collect()
    perShard.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(3) == r.getLong(2) + 1)
    }
  }

  test("nextFitBins: next-fit never opens a bin the previous doc still fit") {
    // replay the sequential definition on the driver and compare exactly
    val got = Packing.nextFitBins(docs, "doc_id", "text", nShards = 4, capacity = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val toks = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (shard <- 0L until 4L) {
      var bin = 0L; var fill = 0L; var first = true
      toks.keys.toSeq.sorted.filter(_ % 4 == shard).foreach { id =>
        val t = toks(id)
        if (t > 0) {
          if (first) { fill = t; first = false }
          else if (fill + t > 64) { bin += 1; fill = t }
          else fill += t
          expect((shard, id)) = bin
        }
      }
    }
    assert(got == expect.toMap)
  }

  test("packing output is invariant to input partitioning") {
    val a = Packing.nextFitStats(docs, "doc_id", "text", 4, 64).collect().toSet
    val b = Packing.nextFitStats(docs.repartition(13), "doc_id", "text", 4, 64)
      .collect().toSet
    assert(a == b)
    val c = Packing.chunkStats(docs, "doc_id", "text", 4, 64).collect().toSet
    val d = Packing.chunkStats(docs.repartition(13), "doc_id", "text", 4, 64)
      .collect().toSet
    assert(c == d)
  }

  test("slidingChunks: boundaries, overlap, and the one-empty-chunk convention") {
    import spark.implicits._
    val d = Seq((0L, "t1 t2 t3 t4 t5 t6 t7"), (1L, "a b"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Packing.slidingChunks(d, "doc_id", "text", chunkLen = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[String](2)).toMap
    // doc0 (7 toks): starts 1,4,7 → [1..4], [4..7], [7]
    assert(got((0L, 0L)) == Seq("t1", "t2", "t3", "t4"))
    assert(got((0L, 1L)) == Seq("t4", "t5", "t6", "t7"))
    assert(got((0L, 2L)) == Seq("t7"))
    // short doc: one partial chunk; empty doc: one empty chunk
    assert(got((1L, 0L)) == Seq("a", "b"))
    assert(got((2L, 0L)) == Seq.empty)
    assert(got.size == 5)
  }

  test("chunkStats: budget accounting is exact") {
    val st = Packing.chunkStats(docs, "doc_id", "text", 4, 64).collect()
    st.foreach { r =>
      val total = r.getLong(2); val nSeqs = r.getLong(3); val ppm = r.getLong(5)
      // concat-and-chunk wastes only the final partial sequence
      assert(nSeqs == (total + 63) / 64)
      assert(ppm == total * 1000000L / (nSeqs * 64L))
    }
  }
}
