package graft.operators

import org.apache.spark.sql.DataFrame
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
}
