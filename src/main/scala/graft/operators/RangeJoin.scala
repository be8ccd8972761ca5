package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: attach to each fact row the band whose
  * [lo, hi) interval contains its value.
  *
  * The bands side is assumed small (binning tables, SLA tiers, histograms)
  * and is broadcast, so the non-equi condition executes as a broadcast
  * nested-loop join — no shuffle of the fact side at any scale. For two
  * *large* range sides the right approach is interval bucketing (overlap
  * keys) — not needed for the engine's declared surface.
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
}
