package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Time-series regularization: resample an event table onto a dense,
  * gap-free calendar grid. The batch analogue of a streaming tumbling
  * window, with the property streaming can't give you retroactively —
  * explicit zero rows for buckets where nothing happened (rate
  * dashboards, anomaly detection, and seasonal models all need the
  * zeros, not missing rows).
  *
  * Plan shape at scale: the only full-data pass is the groupBy count
  * (one shuffle, map-side combined). The calendar scaffold is
  * (distinct keys) × (days in span) — bounded by key cardinality, not
  * by input rows — so the gap-fill join runs on aggregated data only.
  */
object Resample {

  /** Zero-filled daily event counts per key over the table's global
    * [min(ts), max(ts)] day span.
    *
    * @return (keyCol, day: date, n: long) — every (key, day) cell of
    *         the span exactly once, n = 0 where the source has no rows
    */
  def dailyCounts(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // Rows with a null timestamp have no place on the calendar axis and are
    // excluded up front (they would otherwise land in `counts` under a null
    // day that no scaffold cell matches, silently breaking the
    // totals-preserved property). Null KEYS are kept: they form a real
    // grid row, matched below with null-safe equality.
    val rows = df.filter(col(tsCol).isNotNull)
    val counts = rows
      .select(col(keyCol).as("ck"), to_date(col(tsCol)).as("cday"))
      .groupBy("ck", "cday")
      .agg(count(lit(1)).as("n"))
    // One row; sequence() expands it to the day axis on the driver-sized
    // side of the scaffold — never against the raw events.
    val days = rows
      .agg(to_date(min(col(tsCol))).as("d0"), to_date(max(col(tsCol))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val keys = rows.select(col(keyCol).as("k")).distinct()
    val scaffold = keys.crossJoin(broadcast(days))
    // No broadcast hint on the gap-fill join: both sides are bounded by the
    // (keys × days) grid, which is small for low-cardinality keys (AQE will
    // broadcast it) but can be huge for e.g. per-user grids — where a forced
    // broadcast would OOM and the right plan is a co-partitioned join.
    scaffold
      .join(counts, col("k") <=> col("ck") && col("day") === col("cday"), "left")
      .select(col("k").as(keyCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Batch sessionization: assign each event a per-key `session_idx`
    * (0-based) that increments whenever the gap since the key's previous
    * event is ≥ `gapSeconds` — the same boundary rule as Spark's
    * streaming `session_window` (an event inside the gap extends the
    * session; at or past it starts a new one), but with the session ID
    * ON EVERY ROW, which the windowed aggregate form can't give you
    * (per-event features, funnel joins, session-level sampling all need
    * the id, not just the aggregate).
    *
    * One shuffle: the lag and the running sum share the same (key)
    * partitioning and (ts, tie) ordering, so Catalyst plans a single
    * Window over one exchange + sort. Rows with a null timestamp are
    * excluded. Pass a unique tie column to pin the order of equal
    * timestamps.
    */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive: $gapSeconds")
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    df.filter(col(tsCol).isNotNull)
      .withColumn("__gap",
        unix_timestamp(col(tsCol)) - lag(unix_timestamp(col(tsCol)), 1).over(w))
      .withColumn("session_idx",
        sum(when(col("__gap").isNull || col("__gap") >= gapSeconds, 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__gap")
  }

  /** Per-key exponentially-weighted moving average of `valueCol` in event
    * order: s₀ = x₀, sᵢ = α·xᵢ + (1−α)·sᵢ₋₁ (pandas `ewm(adjust=False)`
    * semantics) — the standard smoothing pass before rate alerting or
    * trend features. Appends an `ewma` column; rows with a null
    * timestamp or value are excluded (they have no place in the
    * recurrence).
    *
    * An EWMA is inherently sequential per key, so the scale shape is NOT
    * a per-key collected array (unbounded memory for hot keys) but the
    * same repartition + sortWithinPartitions + single-pass partition scan
    * as [[graft.operators.Packing.nextFitBins]]: one hash shuffle on the
    * key, one local sort, O(1) state per key in the scan. Keys never
    * split across partitions, and a key change mid-partition resets the
    * state. Equal timestamps are broken by `tieCols` — pass a unique
    * column to make the fold order (and thus the result) deterministic.
    *
    * Cross-engine note: the fold applies identical correctly-rounded
    * IEEE ops in an identical order, so results are bit-reproducible in
    * any engine that replays the same recurrence (the oracle uses a
    * recursive CTE); (1−α) is computed from α in double arithmetic —
    * an oracle must write `1.0 - alpha`, not a rounded decimal literal.
    */
  def ewma(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alpha: Double, tieCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    val beta = 1.0 - alpha
    val base = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(Seq(col(keyCol), col(tsCol)) ++ tieCols.map(col) :+
        col(valueCol).cast("double").as("__v"): _*)
    val parted = base
      .repartition(col(keyCol))
      .sortWithinPartitions(Seq(col(keyCol), col(tsCol)) ++ tieCols.map(col): _*)
    val enc = org.apache.spark.sql.Encoders.row(parted.schema.add("ewma", DoubleType))
    parted.mapPartitions { it =>
      var key: Any = null
      var started = false
      var s = 0.0
      it.map { r =>
        val k = r.get(0)
        val v = r.getDouble(r.length - 1)
        if (!started || k != key) { key = k; started = true; s = v }
        else s = alpha * v + beta * s
        Row.fromSeq(r.toSeq :+ s)
      }
    }(enc)
  }
}
