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
    * re-running it), left-anti on `keyCol` against the live
    * `guardTable`, count both sides, WARN with the drop count, hand the
    * surviving rows to `write` — each index's derived writes and their
    * ORDER stay with the caller; they are load-bearing (e.g. the SRP
    * index's buckets-before-vectors torn-append self-healing) — and
    * release both checkpoints whatever happens.
    *
    * @return rows actually appended; a full redelivery returns 0
    */
  def apply(spark: SparkSession, prepared: DataFrame, keyCol: String,
      guardTable: String, payload: String)(
      write: DataFrame => Unit): Long = {
    val p0 = prepared.localCheckpoint(true)
    try {
      // checkpoint the guarded frame too: its two consumers (count +
      // write) must not each re-run the anti-join's scan of the live
      // table — at continuous-ingest scale that doubles per-batch reads
      val kept = p0
        .join(spark.table(guardTable).select(keyCol), Seq(keyCol), "left_anti")
        .localCheckpoint(true)
      try {
        val (in, n) = (p0.count(), kept.count())
        if (n < in) DedupIndex.log.warn(
          s"append dropped ${in - n} of $in already-indexed ${keyCol}s " +
            s"($guardTable): redelivery is benign, but a changed $payload " +
            s"under a re-sent $keyCol is NOT updated - delete+append to replace")
        write(kept)
        n
      } finally kept.unpersist()
    } finally p0.unpersist()
  }
}
