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

  /** Distinct whitespace tokens. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

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

  /** Distinct shingle set (the unit of Jaccard similarity). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Exact Jaccard similarity of two string arrays (treated as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** 64-bit deterministic hash of a column (xxhash64, fixed seed 42). */
  def hash64(c: Column): Column = xxhash64(c)

  /** Family of `k` independent 64-bit hash functions: the string is hashed
    * once, then each family member re-hashes (seed-index, base-hash) — a
    * cheap Long-input hash. Avoids multiplicative mixing, which would trip
    * ANSI-mode overflow checks (ANSI is on by default in Spark 4).
    */
  def hashFamily(c: Column, k: Int): Seq[Column] = {
    val base = xxhash64(c)
    (0 until k).map(i => xxhash64(lit(i), base))
  }
}
