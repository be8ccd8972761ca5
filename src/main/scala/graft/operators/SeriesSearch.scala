package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Time-series subsequence similarity search — the data-series twin of
  * the text/embedding ANN family (REPOSE ICDE'21, Odyssey VLDB'23, and
  * the streaming-subsequence line of work EDBT'19 all serve this query
  * shape): given a query pattern of length m, find the k nearest
  * z-NORMALIZED windows across every series in the corpus. Z-norming
  * per window makes the match amplitude- and offset-invariant (a scaled
  * + shifted copy of the pattern is distance 0), which is what
  * "similar shape" means in the UCR tradition.
  *
  * Engine shape:
  *  - [[seriesOf]] materializes one `(key, xs)` row per series with a
  *    DETERMINISTIC order (array_sort on the full (order, value)
  *    struct — collect_list order is partition-dependent, sorting in
  *    the array domain is not).
  *  - [[slidingZDist]] is ONE narrow pass: each task scans its series
  *    rows and emits (key, off, dist) per window. Window stats are
  *    summed LEFT-TO-RIGHT (the naive O(n·m) loop, not a prefix-sum
  *    trick) so the float result is bit-reproducible and matches an
  *    engine-independent per-window computation — m is small, the
  *    clever version changes rounding, and the oracle cares.
  *  - [[topK]] is orderBy+limit (TakeOrderedAndProject: per-partition
  *    top-k, k rows to the driver).
  *  - [[chunked]] is the long-series escape hatch: split each series
  *    into `chunk`-sized pieces overlapping by m−1, so every window
  *    lives whole in exactly one piece — per-task memory is bounded by
  *    `chunk` at ANY series length and the result set is IDENTICAL to
  *    the unchunked scan (spec-pinned), the standard partitioning of
  *    distributed data-series systems.
  */
object SeriesSearch {

  /** One row per series: `(key, xs)` with values ordered by `orderCols`
    * (ties included in the sort key, so the array is deterministic
    * under any partitioning).
    */
  def seriesOf(
      df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)))
        .as("__s"))
      .select(col(keyCol),
        expr("transform(__s, r -> r.__v)").as("xs"))

  /** Z-normalized Euclidean distance of `q` against every length-|q|
    * window of every series: `(key, off, dist)`, `off` 0-based. Windows
    * shorter series contribute nothing. A flat window (sd < 1e-12)
    * z-norms to the zero vector (the UCR convention), so its distance
    * is `|z(q)| = sqrt(m)` — reported, not dropped, and never NaN.
    */
  def slidingZDist(
      series: DataFrame, keyCol: String, q: Array[Double]): DataFrame = {
    val zq = preparedQuery(q)
    requireIntegralKey(series, keyCol)
    val spark = series.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(zq)
    series.select(col(keyCol).cast("long"), col("xs"))
      .as[(Long, Array[Double])]
      .flatMap { case (key, xs) =>
        scoreWindows(xs, base = 0, ownStarts = Int.MaxValue, bc.value)
          .map { case (off, d) => (key, off, d) }
      }
      .toDF(keyCol, "off", "dist")
  }

  /** The k nearest windows corpus-wide, deterministic tie-break on
    * (key, off); `dist` rounded to 6 decimals so near-equal sums order
    * identically across engines.
    */
  def topK(
      series: DataFrame, keyCol: String, q: Array[Double],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    slidingZDist(series, keyCol, q)
      .select(col(keyCol), col("off"), round(col("dist"), 6).as("dist"))
      .orderBy(col("dist"), col(keyCol), col("off"))
      .limit(k)
  }

  /** Exact long-series partitioning: one `(key, start, xs)` piece row
    * per `chunk` window positions, each piece carrying the m−1 follow-on
    * values so every window lives whole in exactly one piece. Feed the
    * pieces to [[slidingZDist]] keyed however you like and add `start`
    * to its offsets — or use [[chunkedZDist]] which does both.
    */
  def chunked(
      series: DataFrame, keyCol: String, chunk: Int, m: Int): DataFrame = {
    require(chunk >= m && m >= 2, s"need chunk >= m >= 2: chunk=$chunk m=$m")
    requireIntegralKey(series, keyCol)
    val spark = series.sparkSession
    import spark.implicits._
    series.select(col(keyCol).cast("long"), col("xs"))
      .as[(Long, Array[Double])]
      .flatMap { case (key, xs) =>
        if (xs == null || xs.length < m) Iterator.empty
        else {
          val nWin = xs.length - m + 1
          Iterator.range(0, nWin, chunk).map { start =>
            // Long domain: start + chunk + m - 1 overflows Int when the
            // caller passes chunk = Int.MaxValue to mean "unchunked",
            // and the overflowed negative end would slice to empty —
            // a silent empty result instead of the full scan
            val end = math.min(start.toLong + chunk + m - 1, xs.length.toLong).toInt
            (key, start, xs.slice(start, end))
          }
        }
      }
      .toDF(keyCol, "start", "xs")
  }

  /** [[slidingZDist]] over [[chunked]] pieces with offsets mapped back
    * to series coordinates — result rows IDENTICAL to the unchunked
    * scan (same floats: each window's left-to-right loop sees the same
    * values regardless of which piece carries it). Each piece scores
    * only its own `chunk` window positions; the m−1 overlap values are
    * context, not starts, so no window is scored twice.
    */
  def chunkedZDist(
      series: DataFrame, keyCol: String, q: Array[Double],
      chunk: Int): DataFrame = {
    val zq = preparedQuery(q)
    val pieces = chunked(series, keyCol, chunk, q.length)
    val spark = pieces.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(zq)
    pieces.select(col(keyCol), col("start"), col("xs"))
      .as[(Long, Int, Array[Double])]
      .flatMap { case (key, start, xs) =>
        // only the first `chunk` positions are this piece's own starts;
        // the m−1 overlap values are context, scored by the next piece
        scoreWindows(xs, base = start, ownStarts = chunk, bc.value)
          .map { case (off, d) => (key, off, d) }
      }
      .toDF(keyCol, "off", "dist")
  }

  /** Validate + z-norm the query once — both scan entry points share
    * the same contract and message.
    */
  private def preparedQuery(q: Array[Double]): Array[Double] = {
    require(q.length >= 2, s"query pattern needs >= 2 points: ${q.length}")
    val zq = znorm(q)
    require(zq.exists(_ != 0.0), "query pattern is flat - z-norm undefined")
    zq
  }

  /** The ONE scoring core both the flat and the chunked scan call:
    * windows [0, min(ownStarts, |xs|−m+1)) of `xs`, offsets reported at
    * `base +` — so the chunked path cannot drift from the unchunked one
    * (their bit-equality is a spec contract).
    */
  private def scoreWindows(
      xs: Array[Double], base: Int, ownStarts: Int,
      zq: Array[Double]): Iterator[(Int, Double)] = {
    val m = zq.length
    if (xs == null || xs.length < m) Iterator.empty
    else {
      val n = math.min(ownStarts, xs.length - m + 1)
      Iterator.tabulate(math.max(n, 0)) { off =>
        (base + off, windowDist(xs, off, zq))
      }
    }
  }

  /** Scans cast the key to long for one canonical output type; anything
    * non-integral would cast silently (strings to null, doubles by
    * truncation — two series merging under one key). Refuse loudly.
    */
  private def requireIntegralKey(series: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = series.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"series key '$keyCol' must be an integral type, got $dt - " +
        "map string/other keys through a dense id first (Indexing.globalIds)")
  }

  /** Pin a strictly increasing modification-time order across wave
    * directories feeding [[scanStream]]. FileStreamSource orders newly
    * discovered files by mtime: two waves written inside one mtime
    * granularity tick can be picked up OUT of write order, violating the
    * per-key order contract below and silently mis-offsetting every
    * window the swapped waves complete. Call after the waves are fully
    * written, in intended arrival order; each wave's files get the same
    * timestamp, one minute apart per wave (well past any FS granularity,
    * and within FileStreamSource's 7-day `maxFileAge` of each other,
    * which is measured relative to the newest file).
    */
  def pinArrivalOrder(spark: org.apache.spark.sql.SparkSession,
      waveDirs: Seq[String]): Unit = {
    val t0 = System.currentTimeMillis()
    waveDirs.zipWithIndex.foreach { case (dir, i) =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile).foreach(st =>
        fs.setTimes(st.getPath, t0 + i * 60000L, -1))
    }
  }

  /** Continuous subsequence matching — the streaming twin (the EDBT'19
    * streaming-subsequence query shape): drive a STREAM of (key, order,
    * value) points through per-batch scoring, appending each batch's
    * NEW window distances to `outDir`. Cumulative output is
    * batch-boundary INVARIANT: a window is scored by the first batch
    * that completes it — per-key state is the last m−1 values (no
    * complete window, so nothing is ever scored twice) plus the count
    * seen, and the concatenation tail+batch scores exactly the windows
    * the batch completes at their true series offsets. Over ANY
    * partitioning of a series into time-ordered batches, the appended
    * rows equal [[slidingZDist]] on the assembled series — which is
    * what makes the streaming form oracle-checkable against the batch
    * scan.
    *
    * Contract: arrivals must respect per-key ORDER (each micro-batch's
    * points all follow the previous batch's — the file-wave/event-time
    * ingestion discipline); late data is out of scope by construction,
    * like every index stream here.
    *
    * Crash safety is the versioned-state discipline: state is written
    * to `stateDir/state-v{batchId}` and each batch reads
    * `state-v{batchId-1}`, so an at-least-once redelivery re-reads the
    * SAME input state and re-appends byte-identical rows (dedupe on
    * read with `distinct()`, the [[IndexStream]] rule) instead of
    * corrupting offsets by scoring against post-update state.
    */
  def scanStream(
      points: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, q: Array[Double], outDir: String, stateDir: String,
      checkpointDir: String): Unit = {
    preparedQuery(q) // validate once, loudly, before the stream starts
    requireIntegralKey(points, keyCol)
    IndexStream.runIndexed(points, checkpointDir) { (batch, batchId) =>
      scanBatch(batch, batchId, keyCol, orderCols, valueCol, q,
        outDir, stateDir)
    }
  }

  /** One [[scanStream]] micro-batch — package-visible so specs can drive
    * the redelivery window directly (the [[graft.streaming.EventStreams]]
    * `upsertBatch` precedent).
    */
  private[graft] def scanBatch(
      batch: DataFrame, batchId: Long, keyCol: String,
      orderCols: Seq[String], valueCol: String, q: Array[Double],
      outDir: String, stateDir: String): Unit = {
    val zq = preparedQuery(q)
    val m = zq.length
    val spark = batch.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(zq)
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = s"$stateDir/state-v${batchId - 1}"
    val state: DataFrame =
      if (fs.exists(new org.apache.hadoop.fs.Path(prev)))
        spark.read.parquet(prev)
      else Seq.empty[(Long, Array[Double], Long)]
        .toDF(keyCol, "tail", "seen")
    val batchSeries = seriesOf(batch, keyCol, orderCols, valueCol)
    val joined = batchSeries
      .join(state, Seq(keyCol), "full_outer")
      .select(col(keyCol).cast("long"), col("xs"), col("tail"),
        coalesce(col("seen"), lit(0L)).as("seen"))
      .as[(Long, Array[Double], Array[Double], Long)]
      .map { case (key, xs0, tail0, seen) =>
        val tail = if (tail0 == null) Array.empty[Double] else tail0
        val xs = if (xs0 == null) Array.empty[Double] else xs0
        // offsets are Int (the batch family's array-index domain): a key
        // past 2^31 points would WRAP its series offsets — refuse loudly,
        // the repo's convention, instead of colliding (key, off) pairs
        require(seen + xs.length <= Int.MaxValue.toLong,
          s"series $key exceeds 2^31 points - offsets would overflow")
        (key, tail ++ xs, seen)
      }
      .toDF(keyCol, "xs", "seen")
      .localCheckpoint(true)
    try {
      // score: every window of tail++batch is NEW (the tail alone is
      // m-1 points — no complete window), at series offset
      // seen - |tail| + local. |tail| = min(seen, m-1).
      joined.as[(Long, Array[Double], Long)]
        .flatMap { case (key, xs, seen) =>
          val base = (seen - math.min(seen, (bc.value.length - 1).toLong)).toInt
          scoreWindows(xs, base, Int.MaxValue, bc.value)
            .map { case (off, d) => (key, off, d) }
        }
        .toDF(keyCol, "off", "dist")
        .write.mode(SaveMode.Append).parquet(outDir)
      // state for the NEXT batch: last m-1 points, total seen
      joined.as[(Long, Array[Double], Long)]
        .map { case (key, xs, seen) =>
          val tailLen = math.min(seen, (m - 1).toLong).toInt
          (key, xs.takeRight(m - 1), seen + (xs.length - tailLen))
        }
        .toDF(keyCol, "tail", "seen")
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$stateDir/state-v$batchId")
      // prune EVERY superseded version below v{batchId-1} (a redelivery
      // of THIS batch re-reads v{batchId-1}; nothing re-delivers
      // earlier). Listing instead of deleting just v{batchId-2} makes
      // the prune self-healing: a crash between the state write and the
      // prune would otherwise orphan one version per crash forever.
      val dir = new org.apache.hadoop.fs.Path(stateDir)
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("state-v") &&
            name.stripPrefix("state-v").toLong < batchId - 1)
          fs.delete(st.getPath, true)
      }
    } finally joined.unpersist()
  }

  private[operators] def znorm(xs: Array[Double]): Array[Double] = {
    val m = xs.length
    var s = 0.0; var i = 0
    while (i < m) { s += xs(i); i += 1 }
    val mu = s / m
    var s2 = 0.0; i = 0
    while (i < m) { val d = xs(i) - mu; s2 += d * d; i += 1 }
    val sd = math.sqrt(s2 / m)
    if (sd < 1e-12) new Array[Double](m)
    else xs.map(x => (x - mu) / sd)
  }

  /** Distance of the window xs[off, off+m) against the z-normed query:
    * window stats summed left-to-right over the window itself.
    */
  private def windowDist(
      xs: Array[Double], off: Int, zq: Array[Double]): Double = {
    val m = zq.length
    var s = 0.0; var i = 0
    while (i < m) { s += xs(off + i); i += 1 }
    val mu = s / m
    var s2 = 0.0; i = 0
    while (i < m) { val d = xs(off + i) - mu; s2 += d * d; i += 1 }
    val sd = math.sqrt(s2 / m)
    var acc = 0.0; i = 0
    if (sd < 1e-12) {
      while (i < m) { val d = -zq(i); acc += d * d; i += 1 }
    } else {
      while (i < m) {
        val z = (xs(off + i) - mu) / sd
        val d = z - zq(i); acc += d * d; i += 1
      }
    }
    math.sqrt(acc)
  }
}
