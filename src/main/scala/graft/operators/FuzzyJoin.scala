package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String-similarity (fuzzy) self-join: all pairs within edit distance k —
  * entity resolution over product names, near-identical URL/title merging.
  *
  * Candidate generation is Ed-Join-style q-gram prefix filtering
  * (Xiao, Wang & Lin, PVLDB 2008): strings within edit distance k must
  * share at least `max(|Ga|,|Gb|) − k·q` q-grams (one edit destroys at
  * most q grams), so by the prefix-filtering principle two qualifying
  * strings always share a gram among their `k·q + 1` GLOBALLY RAREST
  * grams. Only those prefix grams are indexed — the inverted-index join
  * touches a vanishing fraction of the all-pairs space, and rare grams
  * keep bucket sizes small by construction. Candidates are verified with
  * the exact `levenshtein`, so output equals the naive theta join.
  */
object FuzzyJoin {

  /** All unordered pairs (i < j) of rows whose `strCol` values are within
    * edit distance `k`, as (i, j, dist).
    *
    * Plan shape: one gram explode + frequency agg, a per-string rarest-
    * prefix window (keyed on id — never a global sort), the prefix-gram
    * equi self-join, then a `distinct` and an exact-verify join back to
    * the strings. No step materializes the cross product; candidate
    * volume is bounded by prefix-gram collisions.
    *
    * Short strings (fewer than k·q + 1 grams) keep ALL their grams as
    * prefix, which by the overlap bound still covers every short×long
    * pair; a short×short pair can share zero grams while within
    * distance k, so shorts additionally meet in one dedicated bucket —
    * exactness is preserved, with cost quadratic only in the number of
    * short strings (document corpora: negligible).
    *
    * @param q gram width (2 suits short names; 3 longer text)
    */
  def editDistanceJoin(
      df: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int = 2): DataFrame = {
    require(k >= 1, s"k must be at least 1: $k")
    require(q >= 1, s"q must be at least 1: $q")
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    val pfxLen = k * q + 1
    val grams = base.select(col("id"), length(col("s")).as("len"),
      explode(expr(
        s"transform(sequence(1, greatest(char_length(s) - ${q - 1}, 1))," +
          s" i -> substr(s, i, $q))")).as("g"))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("id").orderBy(col("cnt"), col("g"))
    val prefix = grams.join(freq, Seq("g"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= pfxLen)
      .select("id", "len", "g")
    // strings with ≤ k·q grams: add the shared short-bucket key
    val shorts = base.select(col("id"), length(col("s")).as("len"))
      .filter(greatest(col("len") - (q - 1), lit(1)) <= k * q)
      .withColumn("g", lit("\u0000short"))
    val probe = prefix.unionByName(shorts)
    val cand = probe.alias("a").join(probe.alias("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    cand
      .join(base.select(col("id").as("i"), col("s").as("si")), Seq("i"))
      .join(base.select(col("id").as("j"), col("s").as("sj")), Seq("j"))
      .withColumn("dist", levenshtein(col("si"), col("sj")))
      .filter(col("dist") <= k)
      .select("i", "j", "dist")
  }
}
