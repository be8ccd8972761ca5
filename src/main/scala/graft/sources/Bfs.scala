package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Generic level-synchronized BFS tree expansion — the distributed image of
  * the reference's `Pool.List` (`internal/workerpool/pool.go:168-196`): start
  * from a frontier, expand every node via a `Searcher`-style function
  * (`pool.go:32`), barrier per level (`pool.go:182` `wg.Wait()`), repeat
  * until the frontier is empty.
  *
  * Spark mapping: each level is one distributed `flatMap` job — the job
  * boundary IS the level barrier. Lineage is cut with `localCheckpoint`
  * every few levels so unbounded-depth trees don't accumulate a deep plan
  * (SURVEY.md §7.4). For plain file-system trees prefer
  * [[Crawl.crawlRaw]] — Spark's built-in listing needs no per-level jobs.
  */
object Bfs {

  /** Expand `start` level by level, returning all discovered nodes
    * (including the start frontier). `expand` must be pure — it may run
    * twice for a node on task retry (same contract the reference's
    * `Searcher` needs under its panic-recovery, `crawler.go:121-125`).
    */
  def expand[T: Encoder](
      spark: SparkSession,
      start: Seq[T],
      children: T => Seq[T],
      maxLevels: Int = 1000,
      checkpointEvery: Int = 8): Dataset[T] = {
    var frontier = spark.createDataset(start)
    var all = frontier
    val persisted = scala.collection.mutable.ArrayBuffer.empty[Dataset[T]]
    var level = 0
    while (level < maxLevels && !frontier.isEmpty) {
      frontier = frontier.flatMap(children)
      if ((level + 1) % checkpointEvery == 0) frontier = frontier.localCheckpoint()
      frontier.persist(StorageLevel.MEMORY_AND_DISK)
      persisted += frontier
      all = all.union(frontier)
      level += 1
    }
    // Snapshot the union, then release every per-level frontier cache: a
    // deep tree must not leave one persisted dataset per level alive for
    // the session lifetime — the analogue of the reference's bounded
    // goroutine-leak invariant (`crawler_test.go:634`).
    val out = all.localCheckpoint()
    persisted.foreach(_.unpersist())
    out
  }
}
