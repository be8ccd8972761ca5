package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with the same
  * key whose time column is ≤ the left row's time.
  *
  * Implementation is the union-and-window trick, not a theta join: tag both
  * sides, union, one shuffle+sort on (key, time, side), then
  * `last(struct, ignoreNulls)` over the preceding frame carries the most
  * recent right row forward. Cost is a single exchange of |L| + |R| rows —
  * no per-key cross product, no range-join explosion — which is the plan
  * that survives a 100× scale-up (a naive equi-join + filter + argmax
  * shuffles |L|·|R|/keys rows instead).
  *
  * The carried value is ONE struct holding every requested right column plus
  * the match timestamp, so the output is always a consistent snapshot of a
  * single right row — per-column carries would mix columns from different
  * rows whenever a newer right row holds nulls, and would validate the
  * tolerance against the wrong row.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param leftKey    equality key on the left
    * @param rightKey   equality key on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightVals  right columns to carry (output names keep theirs)
    * @param tieBreak   column among rightVals that orders right rows sharing
    *                   the same (key, time) — the greatest wins, making the
    *                   picked match deterministic
    * @param tolerance  optional maximum staleness (e.g. "30 days"): matches
    *                   older than leftTime - tolerance are nulled out
    * @return left rows + carried right columns (null when no match yet)
    */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      tieBreak: Option[String] = None,
      tolerance: Option[String] = None): DataFrame = {
    val reserved = Seq("_k", "_t", "_side", "_r", "_c")
    require((left.columns ++ right.columns).forall(c => !reserved.contains(c)),
      s"input columns may not use the reserved names ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    // One struct per right row: (__mt match time, value columns). Left rows
    // carry a null struct so last(ignoreNulls) skips them.
    val rightStruct = struct(
      col(rightTime).as("__mt") +: rightVals.map(v => col(v).as(v)): _*)
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(right.select(rightStruct).schema.head.dataType).as("_r"): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rightStruct.as("_r"): _*)
    // Right rows sort before left rows at equal (key, time): a reference row
    // exactly at the probe's timestamp is eligible (inclusive as-of). Within
    // right rows at the same time, tieBreak asc puts the greatest last, so
    // `last(...)` carries it.
    val sortKeys = Seq(col("_t").asc, col("_side").asc) ++
      tieBreak.map(v => col("_r").getField(v).asc_nulls_first)
    val w = Window.partitionBy("_k")
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_c", last(col("_r"), ignoreNulls = true).over(w))
    val fresh = tolerance match {
      case Some(tol) =>
        col("_c").getField("__mt") >= col("_t") - expr(s"INTERVAL $tol")
      case None => lit(true)
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => when(fresh, col("_c").getField(v)).as(v)): _*)
  }
}
