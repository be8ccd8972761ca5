package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay variable-length documents out
  * into fixed-token-budget training sequences and report how efficiently
  * the budget is used. Two standard layouts:
  *
  *  - [[chunkStats]] — concat-and-chunk: documents are concatenated in a
  *    deterministic order and cut every `seqLen` tokens, so sequences are
  *    always full but documents may be split across sequence boundaries
  *    (the GPT-style pretraining layout).
  *  - [[nextFitBins]] — next-fit bin packing: a document that does not fit
  *    the current sequence's remaining budget starts a new sequence, so
  *    documents are never split but sequences carry padding (the
  *    SFT / no-cross-doc-attention layout).
  *
  * Both shard the corpus first (`doc_id % nShards`) and pack *within* a
  * shard in doc_id order — the distributed shape of a real packing job,
  * where each output shard is one writer task. Placement within a shard is
  * order-dependent by definition, so the shard axis is exactly the
  * parallelism axis: per-shard window/scan, no cross-shard coordination.
  * At 100 TB you raise `nShards` to the writer-task count you want; the
  * cost is one shuffle of (doc_id, token_count) pairs — never of text.
  */
object Packing {

  private def sharded(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        (col(idCol) % nShards).cast("long").as("shard"),
        size(TF.tokens(col(textCol))).cast("long").as("tok"))
      // Zero-token docs occupy no budget and have no well-defined
      // placement; excluded in both this plan and the SQL oracle.
      .filter(col("tok") > 0)

  /** Concat-and-chunk packing stats per shard.
    *
    * Pure window arithmetic: the running token sum within a shard gives
    * each document its [start, end) token interval; a document is split
    * iff its interval crosses a `seqLen` boundary. `fill_ppm` is the used
    * fraction of the allocated budget in parts-per-million, computed with
    * integer division so the oracle matches bit-for-bit (only the final
    * partial sequence is padding in this layout).
    *
    * @return (shard, n_docs, total_tokens, n_seqs, n_split_docs, fill_ppm)
    */
  def chunkStats(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int = 8, seqLen: Int = 512): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    sharded(docs, idCol, textCol, nShards)
      .withColumn("end", sum(col("tok")).over(w))
      .withColumn("first_seq", expr(s"(`end` - tok) DIV ${seqLen}L"))
      .withColumn("last_seq", expr(s"(`end` - 1L) DIV ${seqLen}L"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        (max(col("last_seq")) + 1).as("n_seqs"),
        sum(when(col("last_seq") > col("first_seq"), 1L).otherwise(0L))
          .as("n_split_docs"))
      .withColumn("fill_ppm",
        expr(s"total_tokens * 1000000L DIV (n_seqs * ${seqLen}L)"))
  }

  /** Next-fit bin packing per shard: documents are taken in doc_id order;
    * one whose token count exceeds the current bin's remaining capacity
    * starts a new bin (an oversized doc > capacity sits alone in its own
    * overflowing bin — never split). Returns each document's bin
    * assignment.
    *
    * The scan is inherently sequential *within* a shard (each placement
    * depends on the running fill), so this is the one operator family
    * where imperative per-partition logic is the right Spark shape: a
    * `repartition(shard) + sortWithinPartitions + mapPartitions` scan,
    * O(docs) work, no driver state, parallel across shards. Only
    * (doc_id, token_count) rows move — the text itself never shuffles.
    *
    * @return (shard, doc_id, tok, bin) — bin ids start at 0 per shard
    */
  /** Overlapping sliding-window chunks of each document's token stream:
    * chunk i covers tokens [1 + i·stride, 1 + i·stride + chunkLen) — the
    * stride-overlap windowing used to embed long documents. A document
    * shorter than one stride still yields its single (possibly short)
    * chunk; an empty token list yields one empty chunk, so every document
    * stays addressable downstream.
    *
    * Entirely NARROW: `posexplode(sequence(...))` fans each doc out to
    * its chunk starts and `slice` cuts the token array in place — no
    * shuffle at all, perfectly scalable; partitioning is inherited from
    * the input.
    *
    * @return (doc_id, chunk_id, chunk) with chunk_id 0-based
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1: $chunkLen")
    require(stride >= 1, s"stride must be >= 1: $stride")
    docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      // null text → no rows (greatest() would otherwise skip the null
      // size() and fabricate one chunk for a doc that has no token list)
      .filter(col("toks").isNotNull)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), greatest(size(col("toks")), lit(1)), lit(stride)))
          .as(Seq("cid", "s")))
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
        slice(col("toks"), col("s"), lit(chunkLen)).as("chunk"))
  }

  def nextFitBins(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int = 8, capacity: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    sharded(docs, idCol, textCol, nShards)
      .repartition(math.min(nShards, 32), col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .select("shard", "doc_id", "tok")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several shards can share a partition; the sort above groups
        // them, so a shard change resets the scan state
        var shard = Long.MinValue
        var bin = -1L
        var fill = 0L
        it.map { case (s, id, tok) =>
          if (s != shard) { shard = s; bin = 0L; fill = tok }
          else if (fill + tok > capacity) { bin += 1L; fill = tok }
          else fill += tok
          (s, id, tok, bin)
        }
      }
      .toDF("shard", "doc_id", "tok", "bin")
  }

  /** Per-shard stats over [[nextFitBins]]: bin count, padding overhead
    * (`fill_ppm`, integer ppm like [[chunkStats]]) and how many oversized
    * docs overflow a bin on their own.
    *
    * @return (shard, n_docs, total_tokens, n_bins, n_overflow, fill_ppm)
    */
  def nextFitStats(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int = 8, capacity: Int = 512): DataFrame =
    nextFitBins(docs, idCol, textCol, nShards, capacity)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        (max(col("bin")) + 1).as("n_bins"),
        sum(when(col("tok") > capacity, 1L).otherwise(0L)).as("n_overflow"),
        expr(s"sum(least(tok, ${capacity}L))").as("used"))
      .withColumn("fill_ppm", expr(s"used * 1000000L DIV (n_bins * ${capacity}L)"))
      .drop("used")
}
