package graft.operators

import org.apache.spark.sql.DataFrame

/** Ledger for operator-internal `.cache()`s, mixed into operator objects
  * ([[Dedup]], [[TextAnalysis]]) whose methods cache intermediate frames
  * they cannot unpersist before returning (the returned plan still reads
  * them lazily).
  *
  * Why retain at all: Spark's CacheManager dedupes identical plans, so
  * repeated calls over the same corpus reuse one cached relation — the
  * resident-engine warm path. Why a ledger: a continuously-ingesting
  * session whose inputs CHANGE every batch gets no reuse from stale
  * entries — [[releaseCaches]] drops them after each batch's result is
  * materialized (finer-grained than `spark.catalog.clearCache()`, which
  * would also evict the caller's own cached frames).
  *
  * The ledger is bounded: past [[ledgerBound]] entries the oldest frame is
  * unpersisted and dropped on insert, so a session that never calls
  * [[releaseCaches]] (the default path) cannot accumulate unbounded
  * cached relations *or* unbounded retained logical plans. Eviction is
  * safe mid-query — Spark recomputes an unpersisted relation — and a
  * later identical call simply re-caches.
  */
private[graft] trait CacheLedger {

  /** Max retained entries; oldest are unpersisted+dropped beyond this.
    * 64 comfortably covers every per-call cache of the largest composite
    * operator (corpus dedup: sets + signatures + prefixes + edges) times
    * a realistic number of distinct live corpora.
    */
  protected def ledgerBound: Int = 64

  private val ledger = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Route every operator-internal `.cache()` through here — including
    * frames the operator normally unpersists itself, so an exception
    * between cache and unpersist cannot strand an InMemoryRelation outside
    * the ledger's reach. Unpersisting an already-released frame is a no-op.
    *
    * Entries are deduped by plan (`sameResult`): CacheManager keeps ONE
    * shared InMemoryRelation for all plan-identical frames, so a repeated
    * call over the same corpus must not append a second handle — otherwise
    * the bound's oldest-entry eviction would unpersist the very relation
    * the newest call just warmed (unpersist matches by plan, not by
    * DataFrame identity), permanently defeating the warm path.
    */
  protected final def ledgered(df: DataFrame): DataFrame = ledger.synchronized {
    val plan = df.queryExecution.analyzed
    if (!ledger.exists(_.queryExecution.analyzed.sameResult(plan))) {
      ledger += df
      while (ledger.length > ledgerBound) {
        val oldest = ledger.remove(0)
        try oldest.unpersist(blocking = false) catch { case _: Exception => () }
      }
    }
    df
  }

  /** Unpersist (non-blocking) every operator-internal cache created since
    * the last call. Call between ingest batches once the previous batch's
    * output is materialized.
    */
  def releaseCaches(): Unit = ledger.synchronized {
    ledger.foreach(df => try df.unpersist(blocking = false) catch { case _: Exception => () })
    ledger.clear()
  }
}
