package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-ingestion maintenance operators: merging a fresh crawl batch into
  * an existing corpus. The write-side complement of [[Dedup]] — dedup
  * decides what is new; upsert folds it in idempotently.
  */
object Ingest {

  /** Latest-wins upsert: every key present in `batch` takes the batch row;
    * base rows survive only for keys the batch does not touch. Re-running
    * the same batch is a no-op (idempotent ingestion) — the property a
    * resumable 100 TB crawl needs, since a retried partition must not
    * duplicate documents.
    *
    * Plan shape: one left-anti join on the key (both sides shuffle on the
    * key unless the batch is broadcast-small, which AQE decides) plus a
    * union — no window, no sort. At cluster scale, bucketing the corpus by
    * the key makes the anti-join shuffle-free on the corpus side, so a
    * daily batch merge reads the corpus once and shuffles only the batch.
    *
    * Both inputs must share the key columns; the output carries `batch`'s
    * column set (`unionByName`), so schema drift in the batch is surfaced
    * as an analysis error instead of silent column misalignment.
    */
  def upsert(base: DataFrame, batch: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    batch.unionByName(base.join(batch, keyCols, "left_anti"))
  }

  /** Order-independent per-group content digest: `(group…, n, digest)` with
    * digest = Σ over rows of the first 32 bits of md5 of the `|`-joined
    * string form of `hashCols`. Because addition commutes, the digest is
    * invariant to row order, partitioning, and cluster size — two
    * independently-computed copies of a corpus (pre/post migration, two
    * replicas, yesterday's snapshot + today's delta) can be compared with
    * one aggregate each, no sort and no row-level join. 32-bit summands
    * over even trillions of rows stay far below Long overflow.
    *
    * One map-side-combined hash aggregate — the cheapest possible
    * anti-entropy check at 100 TB. Uses md5 (not a engine-native hash) so
    * the same digest is computable in any SQL engine; `concat_ws` skips
    * nulls, so a null and a missing column collide by design — include an
    * explicit count or null-marker column in `hashCols` if that matters.
    */
  def tableDigest(df: DataFrame, groupCols: Seq[String], hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "tableDigest needs at least one hash column")
    val h = conv(substring(
        md5(concat_ws("|", hashCols.map(c => col(c).cast("string")): _*)), 1, 8),
      16, 10).cast("long")
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    grouped.agg(count(lit(1)).as("n"), sum(h).as("digest"))
  }

  /** Snapshot reconciliation: classify every key across two versions of a
    * table as `added` / `removed` / `changed` / `unchanged` — the
    * drill-down report run when [[tableDigest]] says two replicas or two
    * snapshot dates disagree.
    *
    * One full-outer join on the key (both sides shuffle on it; bucketing
    * both snapshots by the key makes it shuffle-free) with all non-key
    * columns packed into one struct per side, compared null-safely — no
    * per-column join conditions, no N comparisons in the join key.
    * Schemas must match; column order is taken from `before`.
    */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val nonKey = before.columns.filterNot(keyCols.contains).toSeq
    require(nonKey.nonEmpty, "diff needs at least one non-key column")
    val b = before.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as("_b"): _*)
    val a = after.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as("_a"): _*)
    b.join(a, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("_b").isNull, lit("added"))
          .when(col("_a").isNull, lit("removed"))
          .when(!(col("_a") <=> col("_b")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** Column-level data profile: one row per profiled column with row
    * count, null count, exact distinct count, and min/max (string form) —
    * the post-ingestion schema-drift / data-quality report.
    *
    * One aggregation job; the multiple exact `countDistinct`s make
    * Catalyst plan an Expand (one stream per distinct column), which is
    * the price of exactness — swap in `approx_count_distinct` for
    * routine 100 TB profiling where ±1% is fine. min/max are cast to
    * string so heterogeneous columns share one report schema; integer
    * and string columns render identically across engines (doubles may
    * not — profile those separately if the string form matters).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col("__n").as("n"),
          (col("__n") - col(s"${c}__nn")).as("n_null"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__mn").as("min_s"),
          col(s"${c}__mx").as("max_s"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** SCD-type-2 change history from an event/snapshot log: per key, collapse
    * consecutive observations with identical tracked attributes and emit one
    * validity interval per attribute version —
    * `(key…, tie…, attr…, effective_from, effective_to)`, with
    * `effective_to` null on the current (open) version.
    *
    * Both passes — the change filter (`lag` over the attribute tuple) and
    * the interval close (`lead` over the surviving change rows) — use the
    * SAME window partitioning on the key, so the whole operator is ONE
    * shuffle; Catalyst reuses the exchange and sort for the second window.
    * At 100 TB this is the minimal plan for history building: each key's
    * log lands in one task, nothing else moves.
    *
    * Attribute comparison is null-safe (`<=>`), so a tracked attribute
    * transitioning to/from null opens a new version rather than being
    * swallowed. Determinism: `tieCols` must make `(tsCol, tieCols)` unique
    * per key, or same-timestamp observations have engine-dependent order.
    *
    * @param tieCols ordering tie-break within a timestamp (e.g. event id)
    * @param attrCols tracked attributes; a change in ANY opens a version
    */
  def changeHistory(
      df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "changeHistory needs key and attribute columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val attrs = struct(attrCols.map(col): _*)
    df.select((keyCols ++ Seq(tsCol) ++ tieCols ++ attrCols).map(col): _*)
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(!(col("_prev") <=> attrs))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .drop("_prev", tsCol)
  }

  /** Point-in-time enrichment of facts against an SCD2 dimension (the
    * [[changeHistory]] output shape): each fact carries the attribute
    * version whose [effective_from, effective_to) interval contains the
    * fact's timestamp — the "which dim version was live when this event
    * happened" join every versioned-dimension warehouse runs.
    *
    * NOT an interval join: version validity is contiguous per key, so the
    * containing interval is just the LATEST version opening at or before
    * the fact — an as-of backward join ([[AsOfJoin.asof]]'s segmented
    * prefix scan: ONE shuffle of facts ∪ versions, no fact×version
    * blow-up, no per-interval explode). The one case as-of alone gets
    * wrong is a HISTORY GAP (a dim key deleted then re-created: the
    * latest-opening version may have CLOSED before the fact), so the
    * carried `effective_to` is checked and the attributes nulled when the
    * fact falls in a gap — a comparison per row, not a join. Facts before
    * a key's first version, or on keys the dim never saw, carry nulls the
    * same way.
    *
    * @param tieBreak column among `attrCols` ordering same-instant
    *                 versions (greatest wins), for dims where one key can
    *                 open two versions at one timestamp
    * @return every fact row + `attrCols` (null when no version contains
    *         the fact time)
    */
  def pointInTime(
      facts: DataFrame, dim: DataFrame, key: String, factTs: String,
      attrCols: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val joined = AsOfJoin.asof(facts, dim, key, key, factTs, "effective_from",
      attrCols :+ "effective_to", tieBreak = tieBreak)
    val valid = col("effective_to").isNull || col(factTs) < col("effective_to")
    joined.select(facts.columns.toSeq.map(col) ++
      attrCols.map(a => when(valid, col(a)).as(a)): _*)
  }

  /** Bloom-filter pre-screen for ingest dedup: mark each batch row as
    * probably-seen (its key may be in the corpus) or certainly-new — the
    * "skip URLs we already crawled" primitive. NO false negatives: a
    * `seen = false` row is guaranteed absent from the corpus, so the
    * expensive exact path ([[upsert]]'s anti-join, or a re-crawl) only
    * runs for the `seen = true` sliver; false positives just degrade
    * the split, never correctness.
    *
    * The filter is built distributed (`stat.bloomFilter` aggregates
    * per-partition bit vectors), collected once, and broadcast — its
    * size is set by (`expectedItems`, `fpp`), independent of corpus
    * bytes: 10⁹ keys at 1% fpp ≈ 1.2 GB of bits, the standard trade for
    * skipping a corpus-sized shuffle per batch. Keys are compared in
    * string form on both sides so numeric/string key columns hash
    * identically.
    */
  def probablyNew(
      corpus: DataFrame, batch: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = corpus.select(col(keyCol).cast("string").as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    val seen = udf((k: String) => k != null && bc.value.mightContain(k))
    batch.withColumn("seen", seen(col(keyCol).cast("string")))
  }

  /** Apply a CDC (change-data-capture) log to a snapshot: each key's NET
    * effect is its latest change by (`tsCol`, `tieCols`) order — an
    * `opCol` value of "delete" removes the key, anything else
    * upserts the change row's payload. Keys the log never touches pass
    * through. Replaying a log suffix that was already applied converges
    * to the same table (the at-least-once delivery contract of every
    * real CDC pipeline).
    *
    * Plan shape: the per-key latest-change pick is `row_number() = 1`,
    * which plans a partial WindowGroupLimit BEFORE its exchange (map
    * tasks ship one candidate per key, not the key's whole history);
    * then one left-anti join against the touched keys plus a union —
    * the [[upsert]] shape. Bucketing both snapshot and log by the key
    * makes the merge shuffle-free.
    *
    * `changes` must carry the snapshot's column set plus (`tsCol`,
    * `opCol`, `tieCols`); the result carries the snapshot schema.
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      tsCol: String, opCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc +: tieCols.map(col(_).desc): _*)
    val net = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = net.filter(col(opCol) =!= "delete")
      .select(base.columns.map(col).toIndexedSeq: _*)
    base.join(net.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Robust per-group outlier flagging via median absolute deviation —
    * the data-quality gate that survives the very outliers it hunts
    * (mean/stddev z-scores are dragged by the anomaly itself; the median
    * and MAD have a 50% breakdown point). Appends `med`, `mad`, and
    * `is_outlier` (= |value − med| > k·mad) to every row.
    *
    * Both medians are the LOWER-median ORDER STATISTIC (the element at
    * rank ceil(n/2)), not an interpolated quantile, for the same reason
    * as [[graft.operators.Sampling.winsorize]]: interpolation differs in
    * final-ulp floating point across engines and a boundary flips the
    * flag — a rank-selected element is engine-exact. k·mad itself is one
    * IEEE multiply of identical doubles, so the compare is exact too.
    *
    * Two rank passes (group-keyed sort shuffles) + two broadcast joins of
    * group-cardinality tables. At 100 TB swap the exact ranks for
    * `percentile_approx` — same join shape, sketch-bounded task memory.
    * Null values take no part in either median and flag as null.
    */
  def madOutliers(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs at least one group column")
    require(k > 0.0, s"k must be positive: $k")
    val part = Window.partitionBy(groupCols.map(col): _*)
    def lowerMedian(in: DataFrame, c: String, as: String): DataFrame =
      in.filter(col(c).isNotNull)
        .withColumn("__rn", row_number().over(part.orderBy(col(c))))
        .withColumn("__n", count(lit(1)).over(part))
        .filter(col("__rn") === ceil(col("__n").cast("double") / 2.0))
        .select(groupCols.map(col) :+ col(c).as(as): _*)
    val meds = lowerMedian(df, valueCol, "med")
    val withMed = df.join(broadcast(meds), groupCols, "left")
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    val mads = lowerMedian(withMed, "__dev", "mad")
    withMed.join(broadcast(mads), groupCols, "left")
      .withColumn("is_outlier",
        when(col(valueCol).isNull, lit(null).cast("boolean"))
          .otherwise(col("__dev") > lit(k) * col("mad")))
      .drop("__dev")
  }

  /** Population stability index between two snapshots of a value column —
    * the drift monitor for corpus refreshes: PSI = Σ_bins (p−q)·ln(p/q)
    * where p/q are the bin shares before/after. PSI < 0.1 is convention
    * for "stable", > 0.25 "shifted enough to investigate".
    *
    * Bins are FIXED equal widths over [lo, hi) plus underflow (−1) and
    * overflow (`bins`) bins — fixed bounds, not quantiles, so the two
    * snapshots and any engine bin identically. Shares are Jeffreys-
    * smoothed ((n + 0.5) / (N + 0.5·(bins+2))) so an empty bin
    * contributes a finite, defined term. One map-side-combined count agg
    * per snapshot (shuffle ∝ bins, not rows); null values are excluded.
    *
    * @return one row per bin: (bin, n_before, n_after, contrib); sum
    *         `contrib` (rounded) for the headline PSI
    */
  def psi(
      before: DataFrame, after: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(hi > lo, s"empty bin range: [$lo, $hi)")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, as: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(greatest(lit(-1L), least(lit(bins.toLong),
          floor((col(valueCol).cast("double") - lo) / width))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(as))
    val b = binned(before, "n_before")
    val a = binned(after, "n_after")
    val joined = b.join(a, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    val totals = joined.agg(sum("n_before").as("tb"), sum("n_after").as("ta"))
    val smooth = lit(0.5 * (bins + 2))
    joined.crossJoin(broadcast(totals))
      .withColumn("__p",
        (col("n_before") + 0.5) / (col("tb") + smooth))
      .withColumn("__q",
        (col("n_after") + 0.5) / (col("ta") + smooth))
      .select(col("bin"), col("n_before"), col("n_after"),
        ((col("__p") - col("__q")) * log(col("__p") / col("__q")))
          .as("contrib"))
  }

  /** Key-skew diagnosis: the top-k heaviest keys with their row counts
    * and integer parts-per-million share — the first report to run
    * before choosing a partitioning/salting strategy, and the evidence
    * behind "this join needs [[graft.operators.Skew.saltedJoin]]".
    *
    * One map-side-combined count agg + a TakeOrdered top-k (never a
    * global sort); share is exact integer arithmetic (n·10⁶ div total),
    * ties broken by key for a deterministic cut.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n"),
        expr("n * 1000000 div __t").as("ppm"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
  }
}
