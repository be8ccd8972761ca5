package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unified-table contract: (a) every mutation — append, compact,
  * z-order — commits data files, zone manifest and ledger as ONE
  * version, so a reader never sees files without their zones or vice
  * versa; (b) a writer killed anywhere before the meta marker leaves
  * the OLD version fully visible and scans exact, and the next mutation
  * heals the torn state; (c) appends are ledgered exactly-once under
  * at-least-once redelivery; (d) scans never list the data directory —
  * the manifest is authoritative — and prune through zones + blooms;
  * (e) vacuum removes exactly the unreferenced files.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def base(): String =
    Files.createTempDirectory("graft_table").toString + "/t"

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(k => (k, k * 2.0, s"u${k % 7}")).toDF("k", "v", "u")

  test("create/append/scan: one version per mutation, results exact, pruning real") {
    val p = base()
    val t = GraftTable.create(rows(0, 800), p, zoneCols = Seq("k", "v"),
      nFiles = 8)
    assert(t.version == 1 && t.files().size == 8)

    t.append(rows(800, 1000))
    assert(t.version == 2)
    assert(t.read().count() == 1000)

    // scan == read().filter(...) exactly, and opens fewer files than the
    // manifest lists (create's 8 + append's generation)
    val preds = Seq(ZoneMap.Range("k", 850L, 920L))
    val got = t.scan(preds).orderBy("k").select("k", "v").collect().toSeq
    val want = t.read().filter(col("k") >= 850L && col("k") <= 920L)
      .orderBy("k").select("k", "v").collect().toSeq
    assert(got == want && got.size == 71)
    assert(t.scanFileCount(preds) < t.files().size,
      "a narrow k band must not open every file")
    // reopen resolves the same state from meta alone
    val t2 = GraftTable.open(spark, p)
    assert(t2.version == 2 && t2.read().count() == 1000)
  }

  test("torn publish: old version stays visible and exact; next mutation heals") {
    val p = base()
    val t = GraftTable.create(rows(0, 500), p, zoneCols = Seq("k"), nFiles = 4)
    val v1Rows = t.read().count()

    // simulate the writer dying BETWEEN data-publish and manifest-publish:
    // a v2 generation lands with no manifest and no meta
    rows(500, 600).write.parquet(s"$p/data/g2")
    assert(t.version == 1, "uncommitted generation must be invisible")
    assert(t.read().count() == v1Rows)

    // ...and dying between manifest-publish and meta-publish
    spark.read.parquet(s"$p/v1/manifest").limit(1)
      .write.parquet(s"$p/v2/manifest")
    assert(t.version == 1, "a manifest without meta is not a commit")
    assert(t.scan(Seq(ZoneMap.Range("k", 0L, 99L))).count() == 100,
      "scans through the torn state read the OLD version exactly")

    // the next real append overwrites both partials and commits v2 whole
    t.append(rows(500, 700))
    assert(t.version == 2 && t.read().count() == 700)
    assert(t.scan(Seq(ZoneMap.Range("k", 450L, 550L))).count() == 101)
  }

  test("ledgered appends: redelivery no-ops, rows land exactly once") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"), nFiles = 2)
    assert(t.lastAppliedBatch() == -1L)

    assert(t.append(rows(100, 200), batchId = 7L))
    assert(t.lastAppliedBatch() == 7L && t.read().count() == 200)
    // redelivered batch re-uses its ORIGINAL id: must not double-land
    assert(!t.append(rows(100, 200), batchId = 7L))
    assert(!t.append(rows(150, 160), batchId = 3L), "non-monotone id skips")
    assert(t.read().count() == 200)
    // the unledgered convenience append advances past the high-water mark
    t.append(rows(200, 250))
    assert(t.read().count() == 250 && t.lastAppliedBatch() == 8L)
  }

  test("compact: files + zones + ledger move as one version; rows exact; pruning restored") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"), nFiles = 1)
    // fragment the table with many small ledgered appends
    (1 to 9).foreach(i => t.append(rows(i * 100L, i * 100L + 100L)))
    assert(t.files().size >= 10)
    val beforeRows = t.read().orderBy("k").collect().toSeq
    val hwm = t.lastAppliedBatch()

    val (before, after) = t.compact(targetRows = 250, sortCols = Seq("k"))
    assert(after < before, s"compaction must shrink the file count: $before -> $after")
    assert(t.read().orderBy("k").collect().toSeq == beforeRows,
      "compaction is a pure relayout")
    assert(t.lastAppliedBatch() == hwm, "the ledger survives a relayout")
    // the sorted rewrite makes the k band prune again
    assert(t.scanFileCount(Seq(ZoneMap.Range("k", 0L, 99L))) <= 2)
    assert(t.scan(Seq(ZoneMap.Range("k", 0L, 99L))).count() == 100)
  }

  test("zorder: atomic relayout makes BOTH columns prunable; rows exact") {
    val p = base()
    // k and y independent: a linear sort on one leaves the other unprunable
    val df = (0L until 4096L).map(k => (k % 64, k / 64, k)).toDF("x", "y", "id")
    val t = GraftTable.create(df, p, zoneCols = Seq("x", "y"), nFiles = 8)
    val beforeRows = t.read().count()

    t.zorder(Seq("x", "y"), nFiles = 16)
    assert(t.read().count() == beforeRows)
    val xFiles = t.scanFileCount(Seq(ZoneMap.Range("x", 10L, 17L)))
    val yFiles = t.scanFileCount(Seq(ZoneMap.Range("y", 10L, 17L)))
    assert(xFiles < 16 && yFiles < 16,
      s"z-order must keep both columns prunable: x=$xFiles y=$yFiles")
    assert(t.scan(Seq(ZoneMap.Range("x", 10L, 17L))).count() == 8 * 64)
  }

  test("bloom point pruning through the manifest; empty scan keeps schema") {
    val p = base()
    // hash-scattered layout: min/max prunes nothing, blooms must
    val t = GraftTable.create(rows(0, 1000).repartition(16), p,
      zoneCols = Seq("v"), bloomCols = Seq("k"), bloomItems = 1000L,
      bloomFpp = 0.01)
    val pointed = t.scanFileCount(Seq(ZoneMap.Point("k", 400L)))
    assert(pointed <= 3, s"bloom must prune the scattered layout: $pointed")
    assert(t.scan(Seq(ZoneMap.Point("k", 400L))).select("k", "v")
      .as[(Long, Double)].collect().toSeq == Seq((400L, 800.0)))
    val none = t.scan(Seq(ZoneMap.Range("v", 1e9, 2e9)))
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v", "u"))
  }

  test("merge: latest-wins upsert rewrites ONLY the affected files; ledgered; loud contracts") {
    val p = base()
    // key-clustered layout: ~10 files, each a narrow k stripe
    val t = GraftTable.create(
      rows(0, 1000).repartitionByRange(10, col("k")).sortWithinPartitions("k"),
      p, zoneCols = Seq("k"))
    val nFiles = t.files().size
    assert(nFiles >= 8)
    // update 30 keys inside one stripe + insert 50 keys above every range
    val updates = (120L until 150L).map(k => (k, -1.0, "upd")).toDF("k", "v", "u")
    val inserts = rows(1000, 1050)
    val (rew, kept) = t.merge(updates.unionByName(inserts), "k")
    assert(rew <= 2 && rew >= 1 && kept >= nFiles - 2,
      s"merge must rewrite only the touched stripe: rew=$rew kept=$kept of $nFiles")
    assert(t.read().count() == 1050)
    // latest wins: every updated key carries the batch's row now
    assert(t.scan(Seq(ZoneMap.Range("k", 120L, 149L)))
      .select("v").as[Double].collect().toSet == Set(-1.0))
    // untouched keys are bit-identical
    assert(t.scan(Seq(ZoneMap.Range("k", 150L, 160L)))
      .orderBy("k").select("k", "v").as[(Long, Double)].collect().toSeq ==
      (150L to 160L).map(k => (k, k * 2.0)))
    // redelivered merge (original id) no-ops
    val hwm = t.lastAppliedBatch()
    assert(t.merge(updates.unionByName(inserts), "k", hwm) == ((0L, 0L)))
    assert(t.read().count() == 1050)
    // vacuum collects exactly the rewritten stripe's old files
    assert(t.vacuum() >= rew)
    assert(t.read().count() == 1050)
    // contracts are loud: duplicate batch keys, un-zoned key column
    intercept[IllegalArgumentException] {
      t.merge(updates.unionByName(updates), "k")
    }
    intercept[IllegalArgumentException] { t.merge(updates, "v") }
  }

  test("version retention: time travel within the window; vacuum keeps retained files") {
    val p = base()
    val t = GraftTable.create(rows(0, 300), p, zoneCols = Seq("k"),
      nFiles = 3, keepVersions = 3)
    t.append(rows(300, 400)) // v2
    t.append(rows(400, 500)) // v3
    assert(t.versions() == Seq(1L, 2L, 3L))
    assert(t.readVersion(1).count() == 300 && t.readVersion(2).count() == 400)
    assert(t.read().count() == 500)
    // vacuum must not break a retained snapshot: its files are referenced
    assert(t.vacuum() == 0L)
    assert(t.readVersion(1).orderBy("k").select("k").as[Long]
      .collect().toSeq == (0L until 300L))
    // a 4th mutation slides the window: v1 pruned, time travel refuses it
    t.append(rows(500, 600)) // v4 -> retained {2,3,4}
    assert(t.versions() == Seq(2L, 3L, 4L))
    intercept[IllegalArgumentException] { t.readVersion(1) }
    // compaction supersedes the append generations, but v3/v4 still
    // reference them — vacuum keeps them until the window slides past
    t.compact(targetRows = 600) // v5 -> retained {3,4,5}
    assert(t.read().count() == 600 && t.readVersion(3).count() == 500)
    assert(t.vacuum() == 0L,
      "retained snapshots v3/v4 still reference the pre-compaction files")
    t.append(rows(600, 610)) // v6 -> {4,5,6}
    t.append(rows(610, 620)) // v7 -> {5,6,7}: g1..g4 now unreferenced
    assert(t.vacuum() >= 3)
    assert(t.read().count() == 620 && t.readVersion(5).count() == 600)
  }

  test("schema evolution: appends add nullable columns; conflicts and missing indexed columns are loud") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"),
      nFiles = 2, keepVersions = 2)
    val v1 = t.version
    // extra column rides in; every pre-evolution row reads it as null
    val withFlag = (100L until 200L)
      .map(k => (k, k * 2.0, s"u${k % 7}", k % 3 == 0))
      .toDF("k", "v", "u", "flag")
    t.append(withFlag)
    assert(t.read().columns.toSeq == Seq("k", "v", "u", "flag"))
    assert(t.read().filter(col("k") < 100 && col("flag").isNull).count() == 100)
    assert(t.read().filter(col("flag") === true).count() ==
      (100L until 200L).count(_ % 3 == 0))
    // scans stay exact through the widened schema
    assert(t.scan(Seq(ZoneMap.Range("k", 50L, 149L))).count() == 100)
    // time travel serves each version under its OWN schema
    assert(t.readVersion(v1).columns.toSeq == Seq("k", "v", "u"))
    // dropping a non-indexed column is fine: it reads back null
    t.append((200L until 210L).map(k => (k, k * 2.0)).toDF("k", "v"))
    assert(t.read().filter(col("k") >= 200L && col("u").isNull).count() == 10)
    // loud: type conflict on an existing column; missing indexed column
    intercept[IllegalArgumentException] {
      t.append((210L until 220L).map(k => (k, "oops")).toDF("k", "v"))
    }
    intercept[IllegalArgumentException] {
      t.append((210L until 220L).map(k => (k, 1.0)).toDF("kk", "v"))
    }
    assert(t.read().count() == 210, "failed appends must not land rows")
  }

  test("commit conflict: a stale writer's publish loses loudly; winner state intact") {
    val p = base()
    val t = GraftTable.create(rows(0, 200), p, zoneCols = Seq("k"), nFiles = 2)
    t.append(rows(200, 300)) // v2 committed by the live writer
    val headRows = t.read().orderBy("k").collect().toSeq

    // a writer that resolved v1 earlier and now publishes v2 BLIND (the
    // lost-update race the conflict detection exists for) must throw,
    // not silently replace the committed v2
    val m = GraftTable.readMeta(spark, p, 2L)
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.publishGeneration(spark, p, rows(900, 950), 2L, m,
        carryForward = None)
    }
    assert(t.version == 2 && t.read().orderBy("k").collect().toSeq == headRows,
      "the loser must leave the winner's commit untouched")
    // the loser's debris is unreferenced garbage, collected by vacuum
    t.vacuum()
    assert(t.read().orderBy("k").collect().toSeq == headRows)

    // two genuinely concurrent mutations: at most one commit per version
    // survives; any loser throws ConcurrentModificationException and the
    // table stays consistent (contiguous committed versions, exact rows)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = Seq(300L, 400L).map { lo =>
      new Thread(() => {
        barrier.await()
        try {
          new GraftTable(spark, p).append(rows(lo, lo + 50))
          outcomes.add("ok")
        } catch {
          case _: java.util.ConcurrentModificationException =>
            outcomes.add("conflict")
          case e: Throwable => outcomes.add(s"unexpected: $e")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val os = outcomes.asScala.toSeq
    assert(os.count(_ == "ok") >= 1 && os.forall(o => o == "ok" || o == "conflict"),
      s"racing writers must commit or lose loudly, never corrupt: $os")
    val vs = t.versions()
    assert(vs == (vs.head to vs.last), s"committed versions contiguous: $vs")
    assert(t.read().count() == 300L + os.count(_ == "ok") * 50L,
      "every surviving commit's rows — and only those — are visible")
  }

  test("CDC deletes: tombstone rows delete without re-insert; rewrite stays file-pruned") {
    val p = base()
    val t = GraftTable.create(
      rows(0, 1000).repartitionByRange(10, col("k")).sortWithinPartitions("k"),
      p, zoneCols = Seq("k"))
    val nFiles = t.files().size
    // one CDC batch: update 20 keys and DELETE 20 keys, all inside the
    // low-k stripe, plus an out-of-range insert
    val ups = (100L until 120L).map(k => (k, -1.0, "upd", "u"))
    val dels = (130L until 150L).map(k => (k, 0.0, "dead", GraftTable.DeleteOp))
    val ins = Seq((5000L, 9.0, "new", "u"))
    val batch = (ups ++ dels ++ ins).toDF("k", "v", "u", "op")
    val (rew, kept) = t.merge(batch, "k", "op")
    assert(rew >= 1 && rew < nFiles && kept == nFiles - rew,
      s"delete-bearing merge must still rewrite only the touched stripe: $rew of $nFiles")
    assert(t.read().count() == 1000 - 20 + 1,
      "tombstones must DELETE, not upsert")
    assert(t.scan(Seq(ZoneMap.Range("k", 130L, 149L))).count() == 0,
      "deleted keys are gone")
    assert(t.scan(Seq(ZoneMap.Range("k", 100L, 119L)))
      .select("v").as[Double].collect().toSet == Set(-1.0))
    assert(!t.read().columns.contains("op"), "the op column is consumed, never stored")
    // a tombstone-only batch works too (and is ledgered)
    val hwm = t.lastAppliedBatch()
    val only = (0L until 10L).map(k => (k, 0.0, "x", GraftTable.DeleteOp))
      .toDF("k", "v", "u", "op")
    t.merge(only, "k", "op")
    assert(t.read().count() == 971 && t.lastAppliedBatch() == hwm + 1)
    // redelivery still no-ops with the op column in play
    assert(t.merge(only, "k", hwm + 1, "op") == ((0L, 0L)))
    assert(t.read().count() == 971)
    // same-batch duplicate across ops (delete+upsert of one key) is loud
    intercept[IllegalArgumentException] {
      t.merge(Seq((1L, 1.0, "a", "u"), (1L, 1.0, "a", GraftTable.DeleteOp))
        .toDF("k", "v", "u", "op"), "k", "op")
    }
  }

  test("merge contract checks run as ONE Spark job") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"), nFiles = 2)
    val batch = rows(100, 200)
    batch.count() // materialize lineage state outside the window
    val sc = spark.sparkContext
    // AQE stages even one aggregate as several scheduler jobs; turn it
    // off so the job count measures AGGREGATE PASSES over the batch
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("graft-contract", "fused merge contract", false)
    try GraftTable.requireMergeContract(batch, "k")
    finally {
      sc.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // the status tracker is fed asynchronously: poll until stable
    def groupJobs(): Int =
      sc.statusTracker.getJobIdsForGroup("graft-contract").length
    val deadline = System.nanoTime() + 2000000000L
    while (groupJobs() == 0 && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(groupJobs() >= 1 && groupJobs() <= 2, // one aggregate; AQE may stage it as 2
      s"the fused contract check must not fan out into per-check jobs: ${groupJobs()}")
    assert(t.version == 1)
    // the fused form still answers all three questions loudly
    intercept[IllegalArgumentException] {
      GraftTable.requireMergeContract(
        rows(0, 5).unionByName(rows(0, 5)), "k")
    }
    intercept[IllegalArgumentException] {
      GraftTable.requireMergeContract(
        Seq((null.asInstanceOf[java.lang.Long], 1.0, "x"))
          .toDF("k", "v", "u"), "k")
    }
  }

  test("relative manifests: a committed table survives a directory move wholesale") {
    val dir = Files.createTempDirectory("graft_mv").toString
    val p = s"$dir/old/t"
    val t = GraftTable.create(rows(0, 400), p, zoneCols = Seq("k"),
      nFiles = 4, keepVersions = 2)
    t.append(rows(400, 500))
    t.merge((10L until 20L).map(k => (k, -5.0, "m")).toDF("k", "v", "u"), "k")
    val want = t.read().orderBy("k").collect().toSeq
    val wantV2 = t.readVersion(2).count()

    // move the WHOLE table directory — the DR-copy / rename scenario
    val p2 = s"$dir/new/t"
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/new"))
    Files.move(java.nio.file.Paths.get(p), java.nio.file.Paths.get(p2))
    val moved = GraftTable.open(spark, p2)
    assert(moved.read().orderBy("k").collect().toSeq == want,
      "reads must follow the moved root")
    assert(moved.readVersion(2).count() == wantV2, "time travel too")
    assert(moved.scan(Seq(ZoneMap.Range("k", 10L, 19L)))
      .select("v").as[Double].collect().toSet == Set(-5.0), "pruned scans too")
    assert(moved.scanFileCount(Seq(ZoneMap.Range("k", 0L, 50L))) <
      moved.files().size)
    // vacuum at the new root resolves the same (referenced) files
    assert(moved.vacuum() == 0L ||
      moved.read().orderBy("k").collect().toSeq == want)
    moved.append(rows(500, 520))
    assert(moved.read().count() == 520, "mutations continue at the new root")
  }

  test("stream-ledgered tables refuse unledgered mutations; explicit ids still work") {
    val p = base()
    // firstBatchId >= 0 is exactly the ingestStream/mergeStream bootstrap
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"),
      nFiles = 2, firstBatchId = 0L)
    assert(t.lastAppliedBatch() == 0L)
    val e1 = intercept[IllegalArgumentException] { t.append(rows(100, 150)) }
    assert(e1.getMessage.contains("stream-ledgered"))
    val up = (0L until 5L).map(k => (k, -1.0, "x")).toDF("k", "v", "u")
    intercept[IllegalArgumentException] { t.merge(up, "k") }
    intercept[IllegalArgumentException] { t.merge(up, "k", "op") }
    assert(t.read().count() == 100, "refused mutations must not land rows")
    // the owning checkpoint's ids keep working
    assert(t.append(rows(100, 150), batchId = 1L))
    assert(t.merge(up, "k", 2L)._1 >= 1)
    assert(t.read().count() == 150)
    // a manually-created table (no stream) keeps the convenience forms
    val p2 = base()
    val t2 = GraftTable.create(rows(0, 50), p2, zoneCols = Seq("k"))
    t2.append(rows(50, 60))
    assert(t2.read().count() == 60)
  }

  test("change feed: per-commit inserts/deletes from manifests; cursor drain; gap is loud") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"),
      nFiles = 2, keepVersions = 4)
    t.append(rows(100, 140)) // v2: pure append -> inserts only
    val batch = ((10L until 15L).map(k => (k, -1.0, "upd", "u")) ++
      (20L until 25L).map(k => (k, 0.0, "d", GraftTable.DeleteOp)))
      .toDF("k", "v", "u", "op")
    t.merge(batch, "k", "op") // v3: rewrite -> deletes + inserts

    val v2c = t.readChanges(1L, 2L)
    assert(v2c.filter(col("_change_type") === "insert").count() == 40 &&
      v2c.filter(col("_change_type") === "delete").count() == 0,
      "an append step reads only its new files")
    val v3c = t.readChanges(2L, 3L)
    // the affected file(s)' old rows delete, the rewritten generation inserts
    assert(v3c.filter(col("_change_type") === "delete" && col("k").between(20, 24))
      .count() == 5, "tombstoned keys appear as deletes")
    assert(v3c.filter(col("_change_type") === "insert" && col("k").between(20, 24))
      .count() == 0, "…and are never re-inserted")
    assert(v3c.filter(col("_change_type") === "insert" && col("k").between(10, 14) &&
      col("v") === -1.0).count() == 5, "updated keys insert their post-image")
    // folding the FULL feed (from 0) by key reproduces the head exactly
    val feed = t.readChanges(0L)
    val alive = feed.withColumn("_w",
        when(col("_change_type") === "insert", 1).otherwise(0))
      .groupBy("k")
      .agg(max(struct(col("_commit_version"), col("_w"), col("v"), col("u")))
        .as("last"))
      .filter(col("last._w") === 1)
      .select(col("k"), col("last.v").as("v"), col("last.u").as("u"))
    assert(alive.orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq,
      "latest-version-wins fold of the feed == the head snapshot")

    // the streaming shape: cursor drain is incremental and redelivery-safe
    val cdir = Files.createTempDirectory("graft_cdf").toString
    var seen = Seq.empty[(Long, Long)] // (version, change rows)
    def drain(): Long = t.drainChanges(cdir) { (df, v) =>
      seen = seen :+ (v, df.count())
    }
    assert(drain() == 3L && seen.map(_._1) == Seq(1L, 2L, 3L))
    assert(drain() == 0L, "a drained cursor re-drains nothing")
    t.append(rows(140, 150)) // v4
    assert(drain() == 1L && seen.last._1 == 4L && seen.last._2 == 10L)

    // feed gap: consuming from a pruned version is loud, never guessed
    t.append(rows(150, 160)) // v5 -> retention window {2,3,4,5}
    intercept[IllegalArgumentException] { t.readChanges(0L) }
    intercept[IllegalArgumentException] { t.readChanges(1L, 5L) }
    assert(t.readChanges(2L, 5L).filter(col("_change_type") === "insert")
      .count() >= 20)
  }

  test("vacuum deletes exactly the unreferenced files; reads unaffected") {
    val p = base()
    val t = GraftTable.create(rows(0, 400), p, zoneCols = Seq("k"), nFiles = 4)
    t.append(rows(400, 500))
    val liveBefore = t.files().size
    // a torn publish leaves an orphaned generation
    rows(900, 950).write.parquet(s"$p/data/g99")
    // compaction supersedes EVERY earlier generation
    t.compact(targetRows = 250, sortCols = Seq("k"))
    val referenced = t.files().toSet

    val deleted = t.vacuum()
    assert(deleted >= liveBefore, s"superseded + orphaned files must go: $deleted")
    // referenced files untouched; a second vacuum is a no-op
    assert(t.files().toSet == referenced)
    assert(t.read().count() == 500)
    assert(t.vacuum() == 0L)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/data/g99")),
      "the orphaned generation must be collected")
  }
}
