package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a corpus — the "train the
  * tokenizer" step of a data pipeline, distributed the way Sennrich et
  * al.'s algorithm wants to be at scale: the corpus collapses ONCE into a
  * (word, count) table (vocabulary-sized, orders of magnitude smaller
  * than the text), and every merge round runs on that table — one
  * pair-count aggregate weighted by word frequency plus one NARROW merge
  * application. Nothing data-sized ever reaches the driver; each round
  * collects exactly one row (the argmax pair).
  *
  * Merge application is greedy leftmost-first (the standard semantics): a
  * fold over the symbol array that joins the last emitted symbol with the
  * current one when they match the pair. A token produced by the merge
  * can never itself be the pair's left side in the same pass (that would
  * need `a+b == a`), so the fold needs no lookbehind flag.
  *
  * Determinism: the argmax pair breaks count ties by (left, right)
  * lexicographic order, so the learned merge table is a pure function of
  * the corpus.
  */
object Bpe {

  /** (word, count) table: whitespace tokens, exact corpus frequencies. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("count"))

  /** Greedy leftmost application of one merge (a, b) → a+b over a symbol
    * array column.
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, typedLit(Seq.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of each word, weighted by word count, summed
    * corpus-wide: (l, r, c).
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("count"), explode(
        zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("count").as("c"))

  /** Character symbols of a word (split keeps no empty strings). */
  def charSyms(w: Column): Column =
    filter(split(w, ""), s => s =!= lit(""))

  /** Train `k` merges. Returns (merges in rank order, the final
    * word→symbols table). Stops early when no adjacent pair remains.
    *
    * Per round: one pair-count aggregate (shuffle ∝ distinct pairs) + a
    * 1-row argmax collect + a narrow merge application. Lineage is cut
    * with a lazy localCheckpoint every 4 rounds, same policy as
    * [[Dedup.components]].
    */
  def trainMerges(
      wordCounts: DataFrame, k: Int): (Seq[(String, String, Long)], DataFrame) = {
    require(k > 0, s"k must be positive: $k")
    var words = wordCounts.select(charSyms(col("word")).as("syms"), col("count"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((a, b, c))
        words = words.select(applyMerge(col("syms"), a, b).as("syms"), col("count"))
        round += 1
        if (round % 4 == 0) words = words.localCheckpoint(false)
      }
    }
    (merges.toSeq, words)
  }

  /** Tokenize a corpus with a learned merge table: per-word symbol arrays
    * with every merge applied in rank order, flattened back to one token
    * array per document — fully NARROW (the merge chain is a fixed
    * expression tree inside a `transform` lambda; no explode, no shuffle,
    * document order preserved by construction). The expression tree grows
    * with the merge count — suited to test/eval-sized merge tables; a
    * production encoder would compile the full table into a custom
    * Expression, same shape as [[graft.plans.Winnow]].
    */
  def encode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      flatten(transform(graft.functions.TextFunctions.tokens(col(textCol)),
        w => merges.foldLeft(charSyms(w)) {
          case (acc, (a, b)) => applyMerge(acc, a, b)
        })).as("tokens"))
}
