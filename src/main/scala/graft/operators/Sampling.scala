package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * The split decision is a pure function of the row's key — no RNG state,
  * no partition dependence — so it is reproducible across engines, runs,
  * cluster sizes, and re-shuffles; new data lands in a stable split and a
  * row never migrates between train and validation when the corpus grows.
  * That property is what `df.randomSplit` (seeded per-partition RNG, so
  * partitioning-dependent) cannot give a long-lived corpus.
  *
  * The hash is md5 of the key's string form: cryptographically mixed (any
  * key skew becomes uniform bucket load) and bit-identical in every engine
  * that implements standard md5, so the split is SQL-oracle-checkable.
  */
object Sampling {

  /** Uniform [0, 1) weight for a key: the first 8 hex chars of md5 as a
    * 32-bit integer, scaled. conv() parses hex; the value is < 2^32 so the
    * long math is exact (no ANSI overflow).
    */
  def hashWeight(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Tag every row with a stable split label: "train" when the key's hash
    * weight < trainFrac, else "val". Narrow (no shuffle, no sort).
    *
    * Passing a GROUP column (domain, author, session) as the key makes this
    * a leakage-safe group split: the decision depends only on the group
    * value, so every row of a group lands in the same split — near-dup
    * documents from one domain can never straddle train and validation.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainFrac: Double): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0, s"trainFrac out of (0,1): $trainFrac")
    df.withColumn("split",
      when(hashWeight(col(keyCol)) < trainFrac, lit("train")).otherwise(lit("val")))
  }

  /** Stratified downsample: keep a row when its key's hash weight falls
    * under the stratum's fraction — per-class rebalancing (e.g. cap the
    * dominant language while keeping all of a rare one). Same determinism
    * contract as [[hashSplit]]: pure function of (key, stratum fractions),
    * stable under reshuffles and growth; narrow, no shuffle.
    */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      fracs: Map[String, Double], defaultFrac: Double): DataFrame = {
    (fracs.values.toSeq :+ defaultFrac).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of [0,1]: $f"))
    val frac = fracs.foldLeft(lit(defaultFrac)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashWeight(col(keyCol)) < frac)
  }

  /** Keep at most `n` rows per group, ranked by `ordering` (ties must be
    * broken by a unique column for determinism). The per-domain cap of a
    * crawl pipeline: stops one giant domain from dominating the corpus.
    *
    * One shuffle on the group key. The window sorts each group; for
    * power-law groups far larger than memory prefer the bounded
    * [[graft.functions.TopKAggregator]] shape (heap of n per group,
    * map-side combined) — at a cap of ~thousands the sort is fine and
    * keeps the full row without re-join.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, n: Int,
      ordering: Seq[Column]): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic importance sampling: keep each row with probability
    * `probCol` (clamped to [0, 1]), decided by the row key's hash weight —
    * the quality-weighted downsampling of training recipes (keep
    * high-quality docs surely, low-quality ones proportionally), with
    * every guarantee of [[hashSplit]]: reproducible across engines, runs,
    * partitioning, and corpus growth, and MONOTONE in the probability (a
    * row kept at p is kept at every p' > p, so tightening a quality
    * threshold only removes rows — resamples never churn the kept set).
    * Narrow: no shuffle, no RNG state.
    */
  def importanceSample(df: DataFrame, keyCol: String, probCol: String): DataFrame =
    df.filter(hashWeight(col(keyCol)) <
      greatest(least(col(probCol), lit(1.0)), lit(0.0)))

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "A-ES"): keep the k rows per group with the largest
    * priority u^(1/w), where u is the key's [[hashWeight]] and w the
    * row's weight — each row's inclusion probability is proportional to
    * its weight, with no RNG state (same reproducibility contract as
    * [[hashSplit]]: pure function of the key, stable under reshuffles
    * and growth).
    *
    * Rows with null or non-positive weight are excluded (A-ES is
    * undefined there). Priorities are ROUNDED to `keyDecimals` before
    * ranking, ties broken by the key column: `pow`/`ln` differ in the
    * last ulp across libm implementations, and an unrounded rank would
    * let that flip the k-cut between engines — at 12 decimals a flip
    * needs two priorities within 1e-12 of each other AND a rounding
    * boundary between them.
    *
    * One shuffle on the group key; the `row_number <= k` filter plans a
    * partial WindowGroupLimit BEFORE the exchange, so each map task
    * ships at most k rows per group, never the group's full membership.
    * Empty `groupCols` = one global sample (single window partition —
    * fine for driver-sized k, prefer a group column at corpus scale).
    */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String,
      groupCols: Seq[String], k: Int, keyDecimals: Int = 12): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pri").desc, col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__pri",
        round(pow(hashWeight(col(keyCol)),
          lit(1.0) / col(weightCol).cast("double")), keyDecimals))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn", "__pri")
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor row, derive `k` pseudo-random negative ids from a DENSE id
    * space [0, n) — the in-batch-negatives alternative when the corpus
    * ids are contiguous (run [[graft.operators.Indexing.globalIds]]
    * first otherwise). Negative j of anchor a is
    * `md5-weight(a ⊕ j) · n`, with a +1 (mod n) fix-up when it collides
    * with the anchor itself — a pure function of (anchor, j, n), so the
    * draw is reproducible across engines/partitionings and NARROW: no
    * join, no shuffle, no RNG state. Collisions BETWEEN negatives of one
    * anchor are allowed (sampling with replacement), as in standard
    * contrastive recipes.
    *
    * @return one row per (anchor, j): (idCol, neg_idx, neg_id)
    */
  def negativeSamples(
      df: DataFrame, idCol: String, n: Long, k: Int): DataFrame = {
    require(n > 1, s"need an id space larger than 1: $n")
    require(k > 0, s"k must be positive: $k")
    val raw = floor(hashWeight(concat(col(idCol).cast("string"), lit(":"),
      col("neg_idx").cast("string"))) * n).cast("long")
    df.select(col(idCol),
        explode(sequence(lit(0), lit(k - 1))).as("neg_idx"))
      .withColumn("neg_id",
        when(raw === col(idCol), (raw + 1) % n).otherwise(raw))
  }

  /** Per-group upper winsorization: cap `valueCol` at its group's p-th
    * ORDER STATISTIC — the value at rank ceil(p·n) — appending `cap` and
    * `winsorized` (= least(value, cap)) columns. The outlier-taming pass of
    * a length/score distribution before aggregation or packing.
    *
    * The cap is deliberately a rank-selected ELEMENT of the data, not an
    * interpolated quantile: interpolation ((1−f)·lo + f·hi vs
    * lo + f·(hi−lo)) differs in final-ulp floating point across engines,
    * and a cap one ulp either side of an actual data value flips the
    * clip comparison — an order statistic is engine-exact and keeps
    * integer columns integer.
    *
    * One shuffle (the per-group sort for row_number) + a broadcast join of
    * the group-cardinality cap table. For groups far beyond task memory at
    * 100 TB, swap the exact rank for `percentile_approx` — same join
    * shape, sketch-bounded memory. Null values sort first and so never
    * become the cap unless the whole group is null; their `winsorized`
    * stays null.
    */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Double): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    require(p > 0.0 && p <= 1.0, s"p out of (0,1]: $p")
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val caps = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(part.orderBy(col(valueCol))))
      .withColumn("__n", count(lit(1)).over(part))
      .filter(col("__rn") === ceil(lit(p) * col("__n")))
      .select(groupCols.map(col) :+ col(valueCol).as("cap"): _*)
    df.join(broadcast(caps), groupCols, "left")
      // least() skips nulls, which would resurrect a null value as the
      // cap — gate it explicitly so null in means null out
      .withColumn("winsorized",
        when(col(valueCol).isNull, lit(null).cast(df.schema(valueCol).dataType))
          .otherwise(least(col(valueCol), col("cap"))))
  }

  /** Temperature-flattened source mixing (the multilingual/multi-source
    * rebalancing of published training recipes): downsample each stratum
    * so group shares follow nᵅ instead of n. The per-row keep rate is
    * `(n_g / n_min)^(α−1)` — the smallest group keeps everything, a group
    * `r`× larger keeps `r^(α−1)` of its rows; α = 1 keeps all rows, α → 0
    * equalizes expected group sizes. Keep/drop is the key's [[hashWeight]]
    * against the group rate, so the draw inherits every [[hashSplit]]
    * guarantee (engine-reproducible, reshuffle-stable, monotone in α).
    *
    * Rates are ROUNDED to 6 decimals before the compare: `pow` differs in
    * the last ulp across libm implementations, and an unrounded rate one
    * ulp either side of a row's hash weight would flip that row between
    * engines. Appends the group's `rate` column.
    *
    * One tiny hash agg (group cardinality rows) + a broadcast join back;
    * the corpus itself never shuffles.
    */
  def temperatureSample(
      df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(strataCol),
        round(pow(col("__n").cast("double") / col("__nmin"), alpha - 1.0), 6)
          .as("rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashWeight(col(keyCol)) < col("rate"))
  }

  /** Global running total of `weightCol` (nulls count 0) in the total
    * order of `sortCols`, appended as `cumCol` — inclusive of the row
    * itself, exact integer arithmetic (the weight is cast to long).
    *
    * Same scale-correct two-pass shape as
    * [[graft.operators.Indexing.globalIds]]: range-shuffle + in-partition
    * sort establishes the global order WITHOUT a one-task global window,
    * then one tiny per-partition-sum job (one long per partition) feeds
    * driver-computed prefix offsets into a narrow final scan.
    *
    * Determinism: `sortCols` must be a unique key (ties would leave the
    * cumulative order partition-internal).
    */
  def runningTotal(
      df: DataFrame, sortCols: Seq[Column], weightCol: String,
      cumCol: String = "cum_weight"): DataFrame = {
    require(sortCols.nonEmpty, "runningTotal needs at least one sort column")
    val prepped = df.withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
    // localCheckpoint: the per-partition-sum job and the final scan are
    // two independent jobs over this frame — without pinning the
    // partitions, a non-row-order-deterministic upstream (sample, shuffle
    // ties) could recompute DIFFERENT partition contents between the two,
    // silently corrupting the cumulative totals
    val sorted = prepped.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(true)
    val wIdx = sorted.schema.fieldIndex("__w")
    val parts = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(wIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = parts.scanLeft(0L)(_ + _)
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(StructField(cumCol, LongType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = bc.value(i)
      it.map { r => s += r.getLong(wIdx); Row.fromSeq(r.toSeq :+ s) }
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
      .drop("__w")
  }

  /** k-fold cross-validation assignment: fold = ⌊hashWeight(key)·k⌋,
    * appended as `foldCol` — every [[hashSplit]] guarantee (pure function
    * of the key, engine-reproducible, reshuffle/growth-stable), narrow.
    * Key on a GROUP column for leakage-safe folds: all rows of a group
    * land in one fold.
    */
  def kfold(df: DataFrame, keyCol: String, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k > 1, s"k must exceed 1: $k")
    df.withColumn(foldCol,
      least(lit(k - 1L), floor(hashWeight(col(keyCol)) * k)))
  }

  /** Purged time-series k-fold with embargo — the leakage-safe CV split
    * for TEMPORAL data, where [[kfold]]'s hash assignment is exactly
    * wrong: a random fold mixes future rows into the training set of a
    * past validation fold. Rows are ranked in global time order
    * (`tsCol`, then `tieCols` — together a unique total order), cut into
    * k contiguous equal-count folds, and each row additionally carries
    * `emb` — the PRECEDING fold's id when the row falls within
    * `embargoSeconds` after that fold's close, else null: training for
    * validation fold f must drop rows with emb = f, because serially-
    * correlated features leak f's immediate future even after the time
    * cut (the published purged/embargoed CV recipe, López de Prado 2018).
    *
    * Scale shape: the global rank comes from [[Indexing.globalIds]]
    * (range shuffle + per-partition zip — never a one-partition window);
    * fold = rank·k div n in INTEGER arithmetic (engine-exact, the
    * quantileNormalize rule); n rides a broadcast 1-row frame and the k
    * fold-close times a broadcast k-row frame. Everything is a selected
    * element or integer division — SQL replays it row for row.
    */
  def purgedTimeFolds(df: DataFrame, tsCol: String, tieCols: Seq[String],
      k: Int, embargoSeconds: Long,
      foldCol: String = "fold", embCol: String = "emb"): DataFrame = {
    require(k > 1, s"k must exceed 1: $k")
    require(embargoSeconds >= 0, s"embargo must be non-negative: $embargoSeconds")
    val g = Indexing.globalIds(df, tsCol +: tieCols, "_pf_gid")
    val folded = g
      .crossJoin(broadcast(g.agg(count(lit(1)).as("_pf_n"))))
      .withColumn(foldCol, expr(s"(_pf_gid * $k) div _pf_n"))
    val closes = folded.groupBy(foldCol)
      .agg(max(col(tsCol)).as("_pf_hi"))
      .select((col(foldCol) + 1).as("_pf_next"), col("_pf_hi"))
    folded.join(broadcast(closes), col(foldCol) === col("_pf_next"), "left")
      .withColumn(embCol,
        when(col("_pf_hi").isNotNull &&
            col(tsCol).cast("double") <=
              col("_pf_hi").cast("double") + embargoSeconds,
          col(foldCol) - 1))
      .drop("_pf_gid", "_pf_n", "_pf_next", "_pf_hi")
  }

  /** Quantile normalization across groups: replace each row's value with
    * the GLOBAL order statistic at the row's within-group rank fraction —
    * after it, every group's value distribution is (up to rank
    * granularity) the global one. The cross-source score-calibration
    * step: a "0.8 quality" from a lenient scorer and a "0.5" from a harsh
    * one land on comparable footing before a single corpus-wide
    * threshold/sampling pass.
    *
    * Everything is rank arithmetic on integers — `pos = rk·(N−1) div
    * max(ng−1, 1)` with RANK (ties share a rank, so equal inputs map
    * equal) — and the mapped value is a SELECTED element of the data,
    * never an interpolation, so the result is engine-exact
    * (same rationale as [[winsorize]]). Needs `rk·(N−1) < 2⁶³`:
    * fine through multi-trillion-row corpora.
    *
    * Plan shape: global order statistics come from
    * [[graft.operators.Indexing.globalIds]]' two-pass range-shuffle (ties
    * are safe — only the sorted value SEQUENCE is consumed, which is
    * deterministic regardless of tie order), the group rank is one
    * window exchange, and the final lookup is an equi-join on the rank
    * position. Rows with a null value are excluded.
    */
  def quantileNormalize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      outCol: String = "qnorm"): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize needs a group column")
    val present = df.filter(col(valueCol).isNotNull)
    val stats = Indexing.globalIds(
      present.select(col(valueCol).cast("double").as("__v")),
      Seq("__v"), "__gid")
    val nRow = stats.agg(count(lit(1)).as("__N"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val ranked = present
      .withColumn("__rk", rank().over(pw.orderBy(col(valueCol))).cast("long") - 1L)
      .withColumn("__ng", count(lit(1)).over(pw))
      .crossJoin(broadcast(nRow))
      .withColumn("__pos", expr("__rk * (__N - 1) div greatest(__ng - 1, 1)"))
    ranked.join(stats.withColumnRenamed("__v", outCol),
        col("__pos") === col("__gid"))
      .drop("__rk", "__ng", "__N", "__pos", "__gid")
  }

  /** Token-budget trim: walk the corpus in `sortCols` order (quality
    * descending, id tie-break — the caller picks) and keep rows while the
    * INCLUSIVE running total of `weightCol` stays ≤ `budget` — "take the
    * best documents until the token budget is spent", the final selection
    * step before packing a training set. Built on [[runningTotal]], so no
    * single-task global sort; the kept set is a pure function of the data
    * and the ordering (no RNG, engine-reproducible, and integer-exact).
    */
  def budgetTrim(
      df: DataFrame, sortCols: Seq[Column], weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    runningTotal(df, sortCols, weightCol, "cum_weight")
      .filter(col("cum_weight") <= budget)
  }
}
