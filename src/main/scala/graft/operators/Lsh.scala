package graft.operators

/** The SRP-LSH scale rules as CODE — the key-width and table-count
  * formulas that were previously doc-comment prose on [[Dedup.embeddingPairs]]
  * and [[Similarity.srpTopK]] (and therefore unenforced: the fixed 8-bit
  * default was measured degenerate at a 505k-vector probe — ~2 billion
  * candidate rows, driver heap death — because 256 buckets per table puts
  * n/256 vectors in each bucket and candidate volume grows as
  * tables · n²/2^bits).
  *
  * Model (standard SRP analysis, Charikar STOC'02): a random hyperplane
  * splits two vectors at angle θ with probability θ/π, so a pair at
  * cosine c collides in one b-bit key with probability p^b where
  * p = 1 − acos(c)/π, and in ≥1 of T independent tables with probability
  * 1 − (1 − p^b)^T.
  *
  *  - [[autoPlanes]] picks b so the EXPECTED BUCKET OCCUPANCY n/2^b stays
  *    ~targetBucket, making per-table candidate volume
  *    ≈ n·(targetBucket−1)/2 — linear in n, at every corpus size.
  *  - [[autoTables]] picks the T that holds P(miss) ≤ missProb for pairs
  *    AT the verification threshold (pairs above it are found with higher
  *    probability; exact dups with p = 1 are found always).
  */
object Lsh {

  /** Sign bits per SRP table for a corpus of `n` vectors:
    * max(floorBits, ⌈log2(n / targetBucket)⌉), capped at `capBits`
    * (key packing allows ≤ 63; past ~24 bits the win is marginal and
    * table counts explode instead — raise targetBucket for corpora that
    * large). The floor keeps fixture-sized corpora on the historical
    * 8-bit keys (bit-stable plans for small data).
    */
  def autoPlanes(
      n: Long, targetBucket: Int = 32, floorBits: Int = 8, capBits: Int = 24): Int = {
    require(targetBucket > 0 && floorBits > 0 && capBits >= floorBits,
      s"bad autoPlanes bounds: target=$targetBucket floor=$floorBits cap=$capBits")
    val needed = math.ceil(
      math.log(math.max(n, 1L).toDouble / targetBucket) / math.log(2.0)).toInt
    math.min(capBits, math.max(floorBits, needed))
  }

  /** Tables holding P(candidate miss) ≤ `missProb` for a pair exactly at
    * cosine `threshold` under `bits`-bit keys:
    * ⌈ln(missProb) / ln(1 − p^bits)⌉ with p = 1 − acos(threshold)/π.
    * Capped (LSH theory: for LOW thresholds at high bit widths the
    * required table count genuinely explodes — that regime needs a
    * smaller width / bigger targetBucket trade, not more tables).
    */
  def autoTables(
      bits: Int, threshold: Double, missProb: Double = 1e-3, cap: Int = 64): Int = {
    require(bits > 0 && missProb > 0 && missProb < 1, s"bad autoTables args")
    val c = math.min(1.0, math.max(-1.0, threshold))
    val p = 1.0 - math.acos(c) / math.Pi
    val hit = math.pow(p, bits)
    if (hit >= 1.0) 1
    else if (hit <= 0.0) cap
    else math.min(cap, math.max(1, math.ceil(math.log(missProb) / math.log1p(-hit)).toInt))
  }
}
