package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Skew: [[asof]] lays one window per key, so a power-law hot key's entire
  * history sorts in a single task — correct and standard, but a scale
  * bottleneck when one key holds billions of rows. [[asofBucketed]] is the
  * escape hatch: a segmented prefix scan over (key, time-bucket) windows.
  */
object AsOfJoin {

  private val Reserved = Seq("_k", "_t", "_side", "_r", "_c", "_b", "_cl",
    "_ci", "_rn", "_cb", "_cf")

  /** Tagged union of both sides: (_k, _t, _side, leftCols…, _r) where _r is
    * the right-row snapshot struct (null on left rows).
    */
  private def unionFrame(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    require((left.columns ++ right.columns).forall(c => !Reserved.contains(c)),
      s"input columns may not use the reserved names ${Reserved.mkString(", ")}")
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
    l.unionByName(r)
  }

  /** Right rows sort before left rows at equal (key, time): a reference row
    * exactly at the probe's timestamp is eligible (inclusive as-of). Within
    * right rows at the same time, tieBreak asc puts the greatest last, so
    * `last(...)` carries it.
    */
  private def sortKeys(tieBreak: Option[String]): Seq[Column] =
    Seq(col("_t").asc, col("_side").asc) ++
      tieBreak.map(v => col("_r").getField(v).asc_nulls_first)

  /** The forward mirror: time DESCENDS so `last(...)` carries the nearest
    * FUTURE right row; `_side` asc still puts right before left at equal
    * time (inclusive), and tieBreak asc still makes the greatest win.
    */
  private def sortKeysFwd(tieBreak: Option[String]): Seq[Column] =
    Seq(col("_t").desc, col("_side").asc) ++
      tieBreak.map(v => col("_r").getField(v).asc_nulls_first)

  /** Epoch seconds of a match/probe time for nearest-distance arithmetic —
    * exact doubles (micros < 2^53), date coerced via timestamp in the
    * session's pinned UTC, matching DuckDB's epoch().
    */
  private def secs(c: Column): Column = c.cast("timestamp").cast("double")

  /** Final projection: left rows only, carried right columns nulled when
    * outside the tolerance (staleness for backward, lead for forward,
    * either side for nearest — which does NOT fall back to the other
    * direction when its pick is out of tolerance, the pandas semantics).
    */
  private def finish(
      carried: DataFrame, leftCols: Seq[String], rightVals: Seq[String],
      tolerance: Option[String], direction: String = "backward"): DataFrame = {
    val fresh = tolerance match {
      case Some(tol) =>
        val mt = col("_c").getField("__mt")
        val lo = mt >= col("_t") - expr(s"INTERVAL $tol")
        val hi = mt <= col("_t") + expr(s"INTERVAL $tol")
        direction match {
          case "backward" => lo
          case "forward" => hi
          case _ => lo && hi
        }
      case None => lit(true)
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => when(fresh, col("_c").getField(v)).as(v)): _*)
  }

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
    * @param tolerance  optional maximum distance (e.g. "30 days"): matches
    *                   beyond it in the joined direction are nulled out
    * @param direction  "backward" (default — latest right ≤ left time),
    *                   "forward" (earliest right ≥ left time), or
    *                   "nearest" (closer of the two; exact ties go
    *                   backward, the pandas merge_asof convention)
    * @return left rows + carried right columns (null when no match yet)
    */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      tieBreak: Option[String] = None,
      tolerance: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward | forward | nearest: $direction")
    val unioned = unionFrame(left, right, leftKey, rightKey, leftTime, rightTime, rightVals)
    val wB = Window.partitionBy("_k")
      .orderBy(sortKeys(tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("_k")
      .orderBy(sortKeysFwd(tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both windows share the _k hash partitioning: one exchange, and the
    // nearest case pays a second sort of the same partitions, never a
    // second shuffle
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("_c", last(col("_r"), ignoreNulls = true).over(wB))
      case "forward" =>
        unioned.withColumn("_c", last(col("_r"), ignoreNulls = true).over(wF))
      case _ =>
        unioned
          .withColumn("_cb", last(col("_r"), ignoreNulls = true).over(wB))
          .withColumn("_cf", last(col("_r"), ignoreNulls = true).over(wF))
          .withColumn("_c",
            when(col("_cf").isNull, col("_cb"))
              .when(col("_cb").isNull, col("_cf"))
              .when(secs(col("_t")) - secs(col("_cb").getField("__mt")) <=
                secs(col("_cf").getField("__mt")) - secs(col("_t")),
                col("_cb"))
              .otherwise(col("_cf")))
    }
    finish(carried, left.columns.toSeq, rightVals, tolerance, direction)
  }

  /** Skew-safe as-of join: a segmented prefix scan. `bucketOf` maps the
    * time column to a coarse bucket (must be monotonic in time — e.g.
    * `date_trunc("month", _)` or `t => floor(t / lit(3600))`); then:
    *
    *  1. carry within each (key, bucket) window — a hot key's history now
    *     splits across as many tasks as it has buckets, bounding the
    *     single-task sort that [[asof]] would lay on it;
    *  2. reduce each (key, bucket) to its last right row and carry THOSE
    *     across buckets — a window over one row per bucket, vanishingly
    *     small next to the data;
    *  3. each row's match = its in-bucket carry, else the carry-in from
    *     earlier buckets.
    *
    * Identical output to [[asof]] for any monotonic `bucketOf` (spec-
    * enforced); ~3× the plan nodes, so reach for it only when a key's
    * per-bucket volume, not total volume, is what fits a task.
    */
  def asofBucketed(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      bucketOf: Column => Column,
      tieBreak: Option[String] = None,
      tolerance: Option[String] = None): DataFrame = {
    val unioned = unionFrame(left, right, leftKey, rightKey, leftTime, rightTime, rightVals)
      .withColumn("_b", bucketOf(col("_t")))
    val wLocal = Window.partitionBy("_k", "_b")
      .orderBy(sortKeys(tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = unioned.withColumn("_cl", last(col("_r"), ignoreNulls = true).over(wLocal))
    // Last right row of each (key, bucket): reverse-sort, keep row 1. This
    // window is also per (key, bucket) — no skew re-introduced.
    val revSort = Seq(col("_t").desc) ++
      tieBreak.map(v => col("_r").getField(v).desc_nulls_last)
    val summaries = unioned.filter(col("_side") === 0)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_k", "_b").orderBy(revSort: _*)))
      .filter(col("_rn") === 1)
      .select(col("_k"), col("_b"), col("_r"))
    // Carry-in per bucket = last right row of any EARLIER bucket. Computed
    // over the full (key, bucket) universe — not just buckets that contain
    // right rows — so a bucket holding only left rows still receives the
    // carry from its past. One row per (key, bucket): tiny window.
    val bucketUniverse = unioned.select(col("_k"), col("_b")).distinct()
    val wCarry = Window.partitionBy("_k").orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = bucketUniverse
      .join(summaries, Seq("_k", "_b"), "left")
      .withColumn("_ci", last(col("_r"), ignoreNulls = true).over(wCarry))
      .select(col("_k"), col("_b"), col("_ci"))
    // (key, bucket) equi-join against the locally-carried frame — both
    // sides hash on the same key, and the summary side is tiny.
    val carried = local.join(carryIn, Seq("_k", "_b"), "left")
      .withColumn("_c", coalesce(col("_cl"), col("_ci")))
    finish(carried, left.columns.toSeq, rightVals, tolerance)
  }
}
