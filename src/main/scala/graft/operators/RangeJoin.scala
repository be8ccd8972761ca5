package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join: attach to each fact row the band whose
  * [lo, hi) interval contains its value.
  *
  * The bands side is assumed small (binning tables, SLA tiers, histograms)
  * and is broadcast, so the non-equi condition executes as a broadcast
  * nested-loop join — no shuffle of the fact side at any scale. For two
  * *large* range sides use [[intervalOverlap]] — interval bucketing turns
  * the non-equi predicate into an equi-join.
  */
object RangeJoin {

  def banded(
      facts: DataFrame, bands: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      joinType: String = "inner"): DataFrame =
    facts.join(
      broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol),
      joinType)

  /** Interval overlap join between two LARGE interval tables (the
    * genomic/temporal shape neither broadcast NLJ nor a band join
    * covers): emit a row for every pair of intervals, matched on
    * `keyCols`, whose closed ranges [lo, hi] intersect.
    *
    * Scale shape: each interval is exploded into the fixed-width buckets
    * it covers and the two sides EQUI-join on (keys…, bucket) — a plain
    * shuffle hash/merge join, never a nested loop over the cross
    * product. A pair whose overlap spans several buckets would match in
    * each; instead of a `distinct` pass, the join keeps only the bucket
    * containing the overlap's START (`greatest(lo, lo)`), attributing
    * every pair to exactly one bucket for free. Bucket fan-out is
    * `span / bucketWidth + 1` rows per interval — pick `bucketWidth`
    * near the typical span so fan-out stays O(1) while each bucket
    * holds few intervals.
    *
    * Output: `keyCols`, then every non-key column of the left/right
    * side under the respective prefix. Bounds must be non-null numeric
    * (epoch seconds, positions); rows with a null bound are dropped.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      loCol: String, hiCol: String, bucketWidth: Long,
      prefixes: (String, String) = ("l_", "r_")): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val (lp, rp) = prefixes
    // EVERY column is prefixed (keys included) so a self-join never has
    // two sides resolving the same attribute name
    def bucketed(df: DataFrame, p: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (acc, c) =>
        acc.withColumnRenamed(c, p + c)
      }
      renamed
        .filter(col(p + loCol).isNotNull && col(p + hiCol).isNotNull &&
          col(p + hiCol) >= col(p + loCol))
        .withColumn(p + "__b", explode(sequence(
          floor(col(p + loCol).cast("double") / bucketWidth).cast("long"),
          floor(col(p + hiCol).cast("double") / bucketWidth).cast("long"))))
    }
    val lb = bucketed(left, lp)
    val rb = bucketed(right, rp)
    val keyCond: Column = (keyCols.map(k => col(lp + k) === col(rp + k)) :+
      (col(lp + "__b") === col(rp + "__b"))).reduce(_ && _)
    val overlap = col(lp + loCol) <= col(rp + hiCol) &&
      col(rp + loCol) <= col(lp + hiCol)
    val onceOnly = floor(greatest(col(lp + loCol), col(rp + loCol))
      .cast("double") / bucketWidth).cast("long") === col(lp + "__b")
    val outCols = keyCols.map(k => col(lp + k).as(k)) ++
      lb.columns.filterNot(c => keyCols.contains(c.stripPrefix(lp)) ||
        c == lp + "__b").map(col) ++
      rb.columns.filterNot(c => keyCols.contains(c.stripPrefix(rp)) ||
        c == rp + "__b").map(col)
    lb.join(rb, keyCond && overlap && onceOnly)
      .select(outCols: _*)
  }
}
