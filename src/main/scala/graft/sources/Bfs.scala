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

  /** [[expand]] with the crawl state AT REST — the reference's `Pool.List`
    * given the restart property its in-memory channels cannot have: every
    * completed level persists as a `level-{k}` parquet (committed
    * atomically by its `_SUCCESS` marker, the index family's publication
    * discipline), so a crawl killed at level 40 of a deep tree resumes
    * from level 40, recomputing at most the one torn level instead of
    * re-expanding the tree from the root. A 100 TB crawl is exactly the
    * job that dies mid-flight; per-level idempotent commits are what make
    * `children` re-runs safe (same purity contract [[expand]] states).
    *
    * Completion persists too (`_CRAWL_DONE`): re-invoking a finished
    * crawl returns the stored result without calling `children` at all.
    * A `maxLevels` stop leaves the state resumable — call again with a
    * higher budget to continue. Levels are append-only; the result is
    * the union of all committed levels.
    */
  def expandResumable[T: Encoder](
      spark: SparkSession,
      start: Seq[T],
      children: T => Seq[T],
      path: String,
      maxLevels: Int = 1000): Dataset[T] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def levelDir(k: Int) = s"$path/level-$k"
    def committed(k: Int) = fs.exists(new Path(levelDir(k), "_SUCCESS"))
    val done = new Path(path, "_CRAWL_DONE")
    if (!committed(0))
      spark.createDataset(start)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(levelDir(0))
    var level = 0
    while (committed(level + 1)) level += 1
    while (level < maxLevels && !fs.exists(done)) {
      // Overwrite clears the torn level a previous crash may have left
      spark.read.parquet(levelDir(level)).as[T].flatMap(children)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(levelDir(level + 1))
      if (spark.read.parquet(levelDir(level + 1)).isEmpty) {
        fs.delete(new Path(levelDir(level + 1)), true) // empty = no level
        fs.create(done, true).close()
      } else level += 1
    }
    spark.read.parquet((0 to level).map(levelDir): _*).as[T]
  }
}
