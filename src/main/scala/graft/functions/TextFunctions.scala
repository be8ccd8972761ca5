package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives used by the dedup / text-analysis operators.
  * Everything here is built from `org.apache.spark.sql.functions` so it stays
  * inside whole-stage codegen — no UDFs on the hot path.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " +"), t => t =!= lit(""))

  /** Word n-gram shingles as space-joined strings, e.g. n=3:
    * ["a b c", "b c d", ...]. Empty array when the document is shorter
    * than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val cnt = size(toks) - lit(n - 1)
    when(cnt > 0,
      transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(toks, i, lit(n))))
    ).otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two arrays (treated as sets). For sorted
    * long-hash arrays prefer the codegen'd [[graft.plans.SortedJaccard]].
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}
