package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the data-layout half of
  * the data-skipping story. [[ZoneMap]] can only prune files whose
  * per-file [min,max] is NARROW for the predicate column, and a linear
  * sort makes files narrow in ONE column while every other column's
  * range stays corpus-wide. Interleaving the bits of several columns
  * into one sort key walks the space-filling Z-curve instead: each file
  * covers a curve segment ≈ an axis-aligned rectangle, so EVERY
  * interleaved column gets a narrow per-file range and zone maps prune
  * on any of them — the public rationale behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` and the classic multidimensional-clustering
  * literature (Morton 1966; Orenstein & Merrett's z-curve indexing).
  *
  * Mechanics, all deterministic and shuffle-minimal:
  *  1. one aggregate computes each column's (min, max) — a single row to
  *     the driver, model-sized;
  *  2. each value maps to a `bits`-wide bucket by linear scaling,
  *     `floor((v − min) / (max − min) · 2^bits)` clamped into
  *     [0, 2^bits); nulls and constant columns go to bucket 0;
  *  3. buckets interleave bit-j-of-column-k → key bit `j·n + k`, built
  *     as a fold of shift/and/or Column arithmetic — pure codegen'd
  *     expressions, no UDF;
  *  4. [[rewrite]] range-partitions by the key into the target file
  *     count and sorts within partitions — ONE shuffle to relayout any
  *     corpus slice, the same cost a linear re-sort would pay.
  *
  * The key orders, it does not identify: two distinct rows may share a
  * key (same buckets), which is irrelevant for layout. Bucketing is a
  * pure function of (value, min, max, bits), so the layout is
  * reproducible run-over-run on the same data.
  */
object Layout {

  /** Morton key column over `cols` (each `bits` wide, ≤ 63 total).
    * `stats` must carry `(lo_c, hi_c)` doubles per column, as produced
    * by [[colStats]] — passing them in keeps the function pure and lets
    * callers reuse corpus stats across slices (a 100 TB relayout runs
    * per-slice but must bucket against GLOBAL bounds, or the same value
    * would land in different buckets in different slices).
    */
  def zkey(cols: Seq[String], stats: Map[String, (Double, Double)],
      bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds a long key")
    val n = cols.size
    val scale = (1L << bits).toDouble
    val buckets = cols.map { c =>
      val (lo, hi) = stats.getOrElse(c, throw new IllegalArgumentException(
        s"no stats for $c (have: ${stats.keys.mkString(", ")})"))
      if (hi <= lo) lit(0L) // constant column: every row bucket 0
      else {
        val scaled = floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(scale))
          .cast("long")
        // clamp AFTER the cast: v == max scales to exactly 2^bits
        coalesce(least(greatest(scaled, lit(0L)), lit((1L << bits) - 1)), lit(0L))
      }
    }
    (for { j <- 0 until bits; k <- 0 until n } yield
      shiftleft(shiftrightunsigned(buckets(k), j).bitwiseAND(lit(1L)), j * n + k))
      .reduce[Column](_ bitwiseOR _)
  }

  /** Per-column (min, max) as doubles in one aggregate — the global
    * bucket bounds every slice of a relayout must share.
    */
  def colStats(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"lo_$c"),
      max(col(c).cast("double")).as(s"hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map { c =>
      val lo = row.getAs[Any](s"lo_$c")
      val hi = row.getAs[Any](s"hi_$c")
      c -> (if (lo == null) (0.0, 0.0)
        else (lo.asInstanceOf[Double], hi.asInstanceOf[Double]))
    }.toMap
  }

  /** Rewrite `df` Z-ordered by `cols` into ~`nFiles` parquet files at
    * `outPath`: key → range-partition → sort-within → write, dropping
    * the key. Row-preserving (a pure relayout), so any query over the
    * result equals the same query over the input — which is what lets
    * the declared query oracle as a plain filter while ZoneMapSpec/
    * LayoutSpec pin the pruning power the relayout buys.
    */
  def rewrite(df: DataFrame, cols: Seq[String], outPath: String,
      nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles > 0, s"nFiles must be positive: $nFiles")
    val key = zkey(cols, colStats(df, cols), bits)
    df.withColumn("__zkey", key)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.parquet(outPath)
  }
}
