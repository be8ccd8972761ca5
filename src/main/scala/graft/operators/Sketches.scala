package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches at rest — the architecture that
  * makes COUNT(DISTINCT) serveable at 100 TB: sketch each storage slice
  * ONCE (per day, per partition, per source) into a bytes column, then
  * answer any rollup by MERGING sketch rows — the raw data is never
  * re-scanned, and a year-over-domains query reads 365·|domains| sketch
  * rows instead of the corpus.
  *
  * Built on Spark's Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, SQL
  * functions since 3.5). Two properties make the pattern sound, both
  * spec-pinned:
  *  - ORDER-FREEDOM: an HLL register set is a pointwise max over hashed
  *    items, so sketching is insensitive to partitioning and insertion
  *    order — the persisted slice is deterministic.
  *  - LOSSLESS MERGE: the union of slice sketches carries the same
  *    register set as one sketch over the concatenated data, so a
  *    rolled-up estimate EQUALS the direct estimate — re-aggregation
  *    costs no accuracy (estimates at the same lgConfigK are equal, not
  *    merely close).
  *
  * The scalar estimate twin (`approx_count_distinct`) is the `q_hll`
  * query; this module is the sketch-AS-DATA form.
  */
object Sketches {

  /** Sketch `valueCol`'s distinct values per group: one hash-agg
    * (map-side partial merges keep the shuffle at one sketch per
    * (task, group)), emitting `(groupCols…, hll: binary)` rows sized
    * ~2^lgk bytes each regardless of input volume. Persist the result
    * as the slice-sketch table.
    */
  def hllByGroup(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgk: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "hllByGroup needs at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgk)).as("hll"))
  }

  /** Roll persisted slice sketches up to `rollupCols` (pass Nil for one
    * global row): merge-then-estimate, never re-scanning raw data.
    * Input must carry the `hll` bytes column [[hllByGroup]] emits.
    */
  def hllRollup(
      sketches: DataFrame, rollupCols: Seq[String]): DataFrame = {
    val est = hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
      .as("approx_distinct")
    if (rollupCols.isEmpty) sketches.agg(est)
    else sketches.groupBy(rollupCols.map(col): _*).agg(est)
  }

  /** Estimate of one persisted sketch row's bytes (scalar form, for
    * joins/projections over a sketch table).
    */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Distinct-overlap estimate between two sketches by inclusion-
    * exclusion: `|A| + |B| − |A ∪ B|`, clamped at 0 (disjoint sets can
    * estimate slightly negative — three independent ±rsd estimates
    * compound). The 100 TB corpus-overlap audit: how much does corpus B
    * share with corpus A — train/benchmark, this month/last month —
    * answered from two persisted sketch rows, NO join, NO re-scan of
    * either corpus. Error scales with |A ∪ B|·rsd, so a small true
    * overlap between huge sets disappears into noise — this is the
    * screening tool; the dedup/decontamination operators are the exact
    * instruments once screening says "look closer".
    */
  def hllOverlap(a: Column, b: Column): Column =
    greatest(lit(0L), hll_sketch_estimate(a) + hll_sketch_estimate(b) -
      hll_sketch_estimate(hll_union(a, b)))

  // ------------------------------------------------------- heavy hitters --

  /** Compress exact per-(keys, item) counts into a k-counter Misra–Gries
    * summary per key group: rank items by (count desc, item asc), subtract
    * the (k+1)-th largest count from every survivor, keep the top k with
    * positive adjusted counts. This is exactly the MG state an O(k)-memory
    * streaming pass would hold (Agarwal et al., Mergeable Summaries), built
    * from exact counts: `mg_count` never overcounts, undercounts by at
    * most n/(k+1), and any item with true frequency > n/(k+1) survives.
    * Both windows share one exchange (same partitioning). Deterministic:
    * the (count, item) order makes the summary a pure function of the
    * counts.
    */
  private def mgCompress(counts: DataFrame, keys: Seq[String],
      itemCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy(keys.map(col): _*)
    val w = part.orderBy(col("cnt").desc, col(itemCol))
    counts
      .withColumn("rnk", row_number().over(w))
      .withColumn("kth1", max(when(col("rnk") === k + 1, col("cnt")))
        .over(part.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("rnk") <= k)
      .select(keys.map(col) :+ col(itemCol) :+
        (col("cnt") - coalesce(col("kth1"), lit(0L))).as("mg_count"): _*)
      .filter(col("mg_count") > 0)
  }

  /** Heavy-hitter summary of `itemCol` per slice — the top-k twin of
    * [[hllByGroup]] (HLL serves COUNT(DISTINCT) at rest, this serves
    * top-k at rest): each storage slice compresses ONCE into ≤ k
    * `(sliceCols…, item, mg_count)` rows, and any rollup merges summary
    * rows instead of re-scanning raw data. At full counter capacity
    * (k ≥ distinct items per slice) the summary IS the exact count table
    * — the nprobe=all ⇒ exact precedent, which is what makes the
    * declared query oracle-checkable; under pressure the MG bounds
    * (never overcount, miss nothing above n/(k+1)) take over,
    * spec-pinned.
    */
  def mgByGroup(df: DataFrame, sliceCols: Seq[String], itemCol: String,
      k: Int): DataFrame = {
    require(sliceCols.nonEmpty, "mgByGroup needs at least one slice column")
    require(k > 0, s"k must be positive: $k")
    mgCompress(
      df.groupBy((sliceCols :+ itemCol).map(col): _*)
        .agg(count(lit(1)).as("cnt")),
      sliceCols, itemCol, k)
  }

  /** Roll persisted slice summaries up to `rollupCols`: sum matching
    * counters per (rollup, item), then re-compress to k — the Agarwal et
    * al. MG merge, so the result is itself a valid summary whose error
    * bound is the SUM of the input bounds (Σ nᵢ/(k+1) = n/(k+1)); at
    * capacity everywhere the rollup equals the direct exact counts. Input
    * must carry the `(item, mg_count)` columns [[mgByGroup]] emits.
    *
    * NO [[hllSliceStream]] twin, deliberately: HLL's guard-free streamed
    * slices work because union is a pointwise MAX (a redelivered
    * byte-identical slice row moves nothing), but MG merges by SUM — a
    * redelivered slice row double-counts. Continuous top-k ingest
    * therefore needs delivery-exactly-once machinery: route it through
    * [[MaterializedAgg]]-style ledgered folding of (slice, item) counts
    * and compress at read, rather than appending raw summary rows —
    * the `stream_mg_topk` query is exactly that composition.
    */
  def mgRollup(slices: DataFrame, rollupCols: Seq[String], itemCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    mgCompress(
      slices.groupBy((rollupCols :+ itemCol).map(col): _*)
        .agg(sum("mg_count").as("cnt")),
      rollupCols, itemCol, k)
  }

  // ------------------------------------------------------ moments sketch --

  /** EXACTLY-mergeable moments + fixed-domain histogram summary per
    * slice — the deterministic sibling of [[hllByGroup]]: where HLL
    * trades exactness for constant size, this summary is constant-size
    * AND rolls up with zero error, so it carries a full SQL oracle.
    * Per slice: non-null count, Σv, Σv² (mean/variance at read via the
    * textbook identity), min, max, and a `bins+2` equi-width histogram
    * over the FIXED domain [lo, hi) — index 0 = underflow (< lo), last =
    * overflow (≥ hi), interior bin i = [lo + (i−1)·w, lo + i·w).
    *
    * Why the domain is a parameter and not derived: mergeability. Counts
    * sum, sums sum, min/min max/max, histograms vector-add — but ONLY
    * if every slice binned against the same edges. Deriving edges
    * per-slice (as a quantile sketch would) buys adaptivity at the cost
    * of approximate merges; the fixed domain buys exact merges at the
    * cost of choosing [lo, hi) up front — the right trade for monitoring
    * pipelines where the domain is a schema-level fact.
    *
    * Exactness note spec-pinned in SketchesSpec: for integer-valued
    * columns every Σv/Σv² under 2^53 is an exactly-representable double
    * and float addition of exact integers is order-free, so slice→rollup
    * equals direct computation BIT-exactly, not merely approximately.
    * The histogram is long counts — exact for any column type.
    */
  def momentsByGroup(df: DataFrame, sliceCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(sliceCols.nonEmpty, "momentsByGroup needs at least one slice column")
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo: $bins, [$lo, $hi)")
    val v = col(valueCol).cast("double")
    val w = (hi - lo) / bins
    val idx = when(v.isNull, lit(null))
      .when(v < lo, 0)
      .when(v >= hi, bins + 1)
      .otherwise(floor((v - lit(lo)) / lit(w)).cast("int") + 1)
    val hist = array((0 to bins + 1).map(i =>
      sum(when(idx === i, 1L).otherwise(0L))): _*)
    df.groupBy(sliceCols.map(col): _*)
      .agg(sum(when(v.isNotNull, 1L).otherwise(0L)).as("n"),
        sum(v).as("s"), sum(v * v).as("s2"),
        min(v).as("mn"), max(v).as("mx"), hist.as("hist"))
  }

  /** Roll moments slices up to `rollupCols` (Nil for one global row):
    * counts/sums add, extrema fold, histograms vector-add — every
    * operation the exact merge of the per-slice computation, so the
    * rollup EQUALS [[momentsByGroup]] run directly on the concatenated
    * data (bit-exactly for integer-valued columns). `bins` must match
    * the slicing call — the histogram length is the check.
    */
  def momentsRollup(slices: DataFrame, rollupCols: Seq[String],
      bins: Int): DataFrame = {
    // fail loudly on a bins mismatch: element_at past the stored length
    // would null the tail and a SMALLER bins would silently reinterpret
    // interior bins as the overflow bucket — one limit-1 probe of the
    // metadata-scale slice table is cheap insurance
    slices.select(size(col("hist")).as("n")).limit(1).collect()
      .foreach { r =>
        require(r.getInt(0) == bins + 2,
          s"momentsRollup(bins = $bins) over slices with ${r.getInt(0)} " +
            s"histogram entries - bins must match the momentsByGroup call " +
            s"(expected ${bins + 2} = bins + under/overflow)")
      }
    val aggs = Seq(
      sum("n").as("n"), sum("s").as("s"), sum("s2").as("s2"),
      min("mn").as("mn"), max("mx").as("mx"),
      array((0 to bins + 1).map(i =>
        sum(element_at(col("hist"), i + 1))): _*).as("hist"))
    if (rollupCols.isEmpty) slices.agg(aggs.head, aggs.tail: _*)
    else slices.groupBy(rollupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Derived mean/variance columns for a moments row: population
    * variance via E[v²] − E[v]², the same expression an oracle spells,
    * so derived stats inherit the rollup's exactness for integer
    * domains.
    */
  def momentsStats(df: DataFrame): DataFrame =
    df.withColumn("mean", col("s") / col("n"))
      .withColumn("variance",
        col("s2") / col("n") - (col("s") / col("n")) * (col("s") / col("n")))

  /** Continuous slice sketching: sketch each micro-batch per group and
    * append the rows to `sliceDir` — [[hllRollup]] over the accumulated
    * slices equals the batch sketch of everything that has arrived,
    * because the merge is lossless and register sets are arrival-form
    * blind.
    *
    * Uniquely in the index family, at-least-once redelivery needs NO
    * guard here: a re-delivered batch re-appends byte-identical sketch
    * rows, and the rollup's pointwise-max union absorbs duplicates —
    * the estimate cannot move. (The usual left-anti machinery would be
    * pure overhead, so this sink intentionally has none.)
    */
  def hllSliceStream(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      sliceDir: String, checkpointDir: String, lgk: Int = 12): Unit =
    IndexStream.run(df, checkpointDir) { batch =>
      hllByGroup(batch, groupCols, valueCol, lgk)
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(sliceDir)
    }
}
