package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max}
import org.apache.spark.storage.StorageLevel

/** The counted-drops idempotent-append core all six persistent indexes
  * share (minhash, SRP embedding, IVF, PQ codes, IVF-PQ composite, BM25
  * postings — whose guard keys the doclens table, written last) — one
  * implementation so the contract cannot drift per index, the
  * [[IndexStream]] rationale applied to the batch side. The contract:
  * foreachBatch redelivery is at-least-once, so every append left-anti
  * guards on the live key set; drops are COUNTED and WARNed, never
  * silent, because a re-sent key with a CHANGED payload is NOT updated
  * (delete+append to replace).
  */
private[operators] object GuardedAppend {

  /** Cache the prepared batch (ONE kernel/encode pass, shared by the
    * guard stats and the write so the guard's effect is measurable
    * without re-running it), collapse WITHIN-batch duplicate keys,
    * left-anti on `keyCol` against the live `guardTable`, WARN
    * with both drop counts, hand the surviving rows to `write` — each
    * index's derived writes and their ORDER stay with the caller; they
    * are load-bearing (e.g. the SRP index's buckets-before-vectors
    * torn-append self-healing) — and release both checkpoints whatever
    * happens.
    *
    * The within-batch guard matters because the anti-join only sees the
    * LIVE table: a key repeated inside one batch would sail through and
    * write two rows per key. For most indexes that is a benign duplicate
    * the maintenance rewrites shed, but for BM25 it silently corrupts
    * statistics (doubled tf, two doclens rows inflating N/avgdl, a
    * double-counted length join) — so the uniqueness contract is
    * enforced HERE, once, for the whole family. Which copy survives is
    * arbitrary (`dropDuplicates`); a batch carrying two DIFFERENT
    * payloads under one key already violates the caller contract and is
    * WARNed just like a guard drop.
    *
    * @return rows actually appended; a full redelivery returns 0
    */
  def apply(spark: SparkSession, prepared: DataFrame, keyCol: String,
      guardTable: String, payload: String)(
      write: DataFrame => Unit): Long = {
    // LAZY persist on the batch (its first consumer — the fused stats
    // aggregate — populates the cache in the pass it pays anyway) and
    // ONE aggregate for both warning inputs (batch size and distinct
    // keys — dropDuplicates collapses all-null keys to one row, hence
    // the null-presence term) instead of the former per-stage
    // checkpoint+count ladder. `kept` stays an EAGER localCheckpoint on
    // purpose: its plan references the live guard table, and a merely
    // persisted plan would be RE-CACHED (fully re-executed) by the
    // CacheManager the moment `write` appends to that table — the
    // checkpoint cuts the lineage so the guard-table write cannot
    // invalidate it (measured: persist here cost ~2× on the stream_*
    // index queries).
    val raw = prepared.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val s = raw.agg(count(lit(1)), countDistinct(col(keyCol)),
        max(col(keyCol).isNull)).head()
      val in = s.getLong(0)
      val uniq = s.getLong(1) +
        (if (!s.isNullAt(2) && s.getBoolean(2)) 1L else 0L)
      val kept = raw.dropDuplicates(keyCol)
        .join(spark.table(guardTable).select(keyCol), Seq(keyCol), "left_anti")
        .localCheckpoint(true)
      try {
        val n = kept.count()
        if (uniq < in) DedupIndex.log.warn(
          s"append collapsed ${in - uniq} of $in rows repeating a $keyCol " +
            s"WITHIN the batch ($guardTable): one arbitrary copy per key " +
            s"was kept - a batch carrying two different ${payload}s under " +
            s"one $keyCol violates the append contract")
        if (n < uniq) DedupIndex.log.warn(
          s"append dropped ${uniq - n} of $uniq already-indexed ${keyCol}s " +
            s"($guardTable): redelivery is benign, but a changed $payload " +
            s"under a re-sent $keyCol is NOT updated - delete+append to replace")
        write(kept)
        n
      } finally kept.unpersist(false)
    } finally raw.unpersist(false)
  }
}
