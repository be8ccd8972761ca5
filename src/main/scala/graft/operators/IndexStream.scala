package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.Trigger

/** The ONE foreachBatch harness behind every index-maintenance stream
  * ([[MinHashIndex.probeStream]], [[SrpEmbedIndex.probeStream]],
  * [[CompIndex.updateStream]]), so the per-batch contract — ordering of
  * probe → output write → index append, and mandatory cleanup of
  * localCheckpointed intermediates — lives in one place and cannot drift
  * per index (three hand-rolled copies is how the r6 checkpoint-block
  * leak happened once already).
  *
  * Semantics all three streams share:
  *  - AvailableNow trigger: drain what exists, then stop — the batch
  *    oracle equivalence the stream specs assert needs a terminating run.
  *  - foreachBatch is at-least-once: a crash between the batch body and
  *    the checkpoint commit re-delivers the batch, so every body routed
  *    through here must be idempotent on the INDEX side (the appends'
  *    left-anti guards, [[CompIndex.update]]'s remap-before-append
  *    order); the output `pairsDir` may legitimately re-append — callers
  *    dedupe on read.
  *  - cleanup runs even when the body throws: a long-lived stream must
  *    not park checkpoint blocks in executor storage waiting for driver
  *    GC.
  */
private[operators] object IndexStream {

  /** Drive `body` once per micro-batch with AvailableNow semantics. */
  def run(incoming: DataFrame, checkpointDir: String)(
      body: DataFrame => Unit): Unit =
    runIndexed(incoming, checkpointDir)((batch, _) => body(batch))

  /** [[run]] with the micro-batch id exposed — for bodies whose
    * idempotence discipline is VERSIONED on the batch id (e.g.
    * [[SeriesSearch.scanStream]]'s state-v{batchId} publication) rather
    * than guarded by a key anti-join.
    */
  def runIndexed(incoming: DataFrame, checkpointDir: String)(
      body: (DataFrame, Long) => Unit): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        body(batch, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** The probe-index batch cycle: materialize the batch once (probe and
    * append share one evaluation of its signature/key kernels), probe it
    * against the index, append the pairs to `pairsDir`, fold the batch
    * in, and ALWAYS drop the checkpointed intermediates — batch first,
    * probe's own tracked frames via the thunk `probe` returned.
    */
  def probeAppend(
      batch: DataFrame, pairsDir: String,
      probe: DataFrame => (DataFrame, () => Unit),
      append: DataFrame => Unit): Unit = {
    val b = batch.localCheckpoint(eager = true)
    val (pairs, cleanup) = probe(b)
    try {
      pairs.write.mode(SaveMode.Append).parquet(pairsDir)
      append(b)
    } finally {
      cleanup()
      b.unpersist()
    }
  }
}
