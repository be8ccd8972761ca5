package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Checkpoint the prepared batch (ONE kernel/encode pass, materialized
    * before the guard so the guard's effect is measurable without
    * re-running it), collapse WITHIN-batch duplicate keys, left-anti on
    * `keyCol` against the live `guardTable`, count every stage, WARN
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
    val raw = prepared.localCheckpoint(true)
    try {
      // checkpoint each stage: every frame below has two consumers (its
      // count + the next stage or the write) which must not each re-run
      // the kernel pass / dedup shuffle / anti-join scan of the live
      // table — at continuous-ingest scale that doubles per-batch work
      val p0 = raw.dropDuplicates(keyCol).localCheckpoint(true)
      try {
        val kept = p0
          .join(spark.table(guardTable).select(keyCol), Seq(keyCol), "left_anti")
          .localCheckpoint(true)
        try {
          val (in, uniq, n) = (raw.count(), p0.count(), kept.count())
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
        } finally kept.unpersist()
      } finally p0.unpersist()
    } finally raw.unpersist()
  }
}
