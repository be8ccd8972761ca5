package graft

import java.nio.file.{Files, Path}
import graft.functions.MonoidAggregator
import graft.sources.{Bfs, Crawl}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Reference-parity goldens for the crawl pipeline.
  *
  * Mirrors the reference's own test strategy (SURVEY.md §5):
  *  - demo golden: sum over `tests/` fixtures = 300 (`cmd/app/app.go:54`)
  *  - real-FS golden: 10 dirs × 10 files of {"data":1} = 100
  *    (`internal/filecrawler/crawler_test.go:64-107`)
  *  - error injection: malformed file ⇒ zero-value substitution + first
  *    error surfaced, result still returned (`crawler_test.go:395-455`,
  *    `crawler.go:253`)
  */
case class Rec(data: Long)

class CrawlSpec extends SparkSpec {
  private val schema = StructType(Seq(StructField("data", LongType)))

  test("golden: reference demo fixtures sum to 300 (app.go:54)") {
    import spark.implicits._
    val res = Crawl.collect[Rec, Long](spark, "/root/reference/tests", schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 300L)
    assert(res.corruptFiles == 0L)
    assert(res.firstError.isEmpty)
  }

  test("golden: 10 dirs x 10 files of {data:1} sum to 100 (crawler_test.go:64-107)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl100")
    for (d <- 0 until 10) {
      val dir = Files.createDirectory(root.resolve(s"d$d"))
      for (f <- 0 until 10)
        Files.writeString(dir.resolve(s"$f.json"), """{"data": 1}""")
    }
    val res = Crawl.collect[Rec, Long](spark, root.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 100L)
  }

  test("error injection: malformed JSON yields zero value + first error (crawler.go:253)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawlerr")
    Files.writeString(root.resolve("good.json"), """{"data": 7}""")
    Files.writeString(root.resolve("bad.json"), """{"data": oops""")
    val res = Crawl.collect[Rec, Long](spark, root.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 7L) // corrupt file contributed the zero value
    assert(res.corruptFiles == 1L)
    assert(res.firstError.exists(_.contains("bad.json")))
  }

  test("csv crawl: recursive tree, corrupt-row accounting, zero substitution") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawlcsv")
    val inner = Files.createDirectories(root.resolve("a/b"))
    Files.writeString(root.resolve("one.csv"), "5\n10\n")
    Files.writeString(inner.resolve("two.csv"), "20\nnot_a_number\n")
    val res = Crawl.collect[Rec, Long](spark, root.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data), format = "csv")
    assert(res.result == 35L) // corrupt row contributed the zero value
    assert(res.corruptFiles == 1L)
    assert(res.firstError.exists(_.contains("two.csv")))
  }

  test("orc crawl: recursive tree reads back the written rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawlorc").toString
    spark.createDataset(Seq(Rec(1), Rec(2))).write.orc(s"$root/x")
    spark.createDataset(Seq(Rec(39))).write.orc(s"$root/y/z")
    val res = Crawl.collect[Rec, Long](spark, root, schema,
      MonoidAggregator.sumLong[Rec](_.data), format = "orc")
    assert(res.result == 42L)
    assert(res.corruptFiles == 0L && res.firstError.isEmpty)
  }

  test("io error matrix: unlistable subtrees and unopenable files surface as firstError with a partial result (crawler_test.go:395-455)") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFs].getName)
    val root = Files.createTempDirectory("crawlio")
    val a = Files.createDirectory(root.resolve("a"))
    Files.writeString(a.resolve("good1.json"), """{"data": 3}""")
    Files.writeString(root.resolve("good2.json"), """{"data": 4}""")
    val unlistable = Files.createDirectory(root.resolve("unlistable"))
    Files.writeString(unlistable.resolve("hidden.json"), """{"data": 50}""")
    val panicdir = Files.createDirectory(root.resolve("panicdir"))
    Files.writeString(panicdir.resolve("hidden2.json"), """{"data": 60}""")
    Files.writeString(root.resolve("noopen.json"), """{"data": 9}""")
    Files.writeString(root.resolve("nopanic.json"), """{"data": 11}""")
    val faultyRoot = "faulty:" + root.toString

    // All four injected failures are captured; the walk continues past them.
    val listing = Crawl.listWithErrors(spark, faultyRoot)
    assert(listing.errors.count(_.op == "list") == 2)
    assert(listing.errors.count(_.op == "open") == 2)
    assert(listing.files.forall(f => f.contains("good1") || f.contains("good2")))

    // Partial result from the readable files + deterministic first error.
    val res = Crawl.collect[Rec, Long](spark, faultyRoot, schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 7L)         // good1 + good2 only
    assert(res.corruptFiles == 2L)   // the two unopenable files
    assert(res.firstError.exists(e =>
      e.startsWith("failed to open:") && e.contains("noopen.json")))
  }

  test("io error injection: permission-denied file is skipped, counted, and surfaced (open-error case)") {
    import spark.implicits._
    import java.nio.file.attribute.PosixFilePermissions
    val root = Files.createTempDirectory("crawlperm")
    Files.writeString(root.resolve("good.json"), """{"data": 30}""")
    val locked = Files.writeString(root.resolve("locked.json"), """{"data": 99}""")
    Files.setPosixFilePermissions(locked, PosixFilePermissions.fromString("---------"))
    val res = Crawl.collect[Rec, Long](spark, root.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 30L)
    assert(res.corruptFiles == 1L)
    assert(res.firstError.exists(e =>
      e.startsWith("failed to open:") && e.contains("locked.json")))
  }

  test("io error: fully unlistable root still returns the zero value plus the error") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFs].getName)
    val root = Files.createTempDirectory("crawlroot0")
    val unlistable = Files.createDirectory(root.resolve("unlistable"))
    Files.writeString(unlistable.resolve("x.json"), """{"data": 5}""")
    val res = Crawl.collect[Rec, Long](spark, "faulty:" + unlistable.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 0L) // the monoid zero — result is still returned
    assert(res.firstError.exists(_.startsWith("failed to list:")))
  }

  test("wholetext crawl: each file becomes one row holding the full contents") {
    import org.apache.spark.sql.types.{StringType => SString}
    val root = Files.createTempDirectory("crawltext")
    val inner = Files.createDirectory(root.resolve("sub"))
    Files.writeString(root.resolve("a.txt"), "first doc\nwith two lines")
    Files.writeString(inner.resolve("b.txt"), "second doc")
    val textSchema = StructType(Seq(StructField("text", SString)))
    val got = Crawl.crawlRaw(spark, root.toString, textSchema, "text", Map.empty)
      .select("text").collect().map(_.getString(0)).toSet
    assert(got == Set("first doc\nwith two lines", "second doc"))
  }

  test("binaryFile crawl feeds the multimodal pipeline end-to-end") {
    import graft.operators.Multimodal
    val root = Files.createTempDirectory("crawlbin")
    val payloads = Map("x.img" -> Array[Byte](1, 2, 3, 4),
      "sub/y.img" -> Array.tabulate[Byte](100)(_.toByte))
    Files.createDirectory(root.resolve("sub"))
    payloads.foreach { case (p, bytes) => Files.write(root.resolve(p), bytes) }
    val raw = Crawl.crawlRaw(spark, root.toString, new StructType(), "binaryFile", Map.empty)
    val feats = Multimodal.extractFeatures(Multimodal.fromBinaryFiles(raw))
      .collect().sortBy(_.n_bytes)
    assert(feats.length == 2)
    assert(feats.map(_.n_bytes).toSeq == Seq(4L, 100L))
    assert(feats.forall(_.format == "img"))
    assert(feats.map(_.id).distinct.length == 2) // stable per-path ids
    assert(feats.forall(_.features.length == 16))
  }

  test("streaming crawl: running monoid total grows as files arrive (unbounded Collect)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawlstream")
    val inner = Files.createDirectory(root.resolve("sub"))
    Files.writeString(root.resolve("a.json"), """{"data": 10}""")
    Files.writeString(inner.resolve("b.json"), """{"data": 20}""")
    val q = Crawl.collectStream[Rec, Long](spark, root.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data), "crawl_stream_total")
    try {
      q.processAllAvailable()
      assert(spark.table("crawl_stream_total").head().getLong(0) == 30L)
      // the unbounded part: a file arriving later folds into the running total
      Files.writeString(inner.resolve("c.json"), """{"data": 12}""")
      q.processAllAvailable()
      assert(spark.table("crawl_stream_total").head().getLong(0) == 42L)
    } finally {
      q.stop()
      spark.catalog.dropTempView("crawl_stream_total")
    }
  }

  test("typed crawl decodes nested depths recursively") {
    import spark.implicits._
    val ds = Crawl.crawl[Rec](spark, "/root/reference/tests", schema)
    assert(ds.collect().map(_.data).sorted.toSeq == Seq(100L, 100L, 100L))
  }

  test("generic BFS expansion visits the whole tree level by level (pool.go:168-196)") {
    import spark.implicits._
    // numeric tree: node n has children 3n+1, 3n+2, 3n+3 while < 40
    val all = Bfs.expand[Int](spark, Seq(0),
      n => if (n < 13) Seq(3 * n + 1, 3 * n + 2, 3 * n + 3) else Seq.empty)
    val got = all.collect().toSet
    def walk(n: Int): Set[Int] =
      Set(n) ++ (if (n < 13) (1 to 3).flatMap(i => walk(3 * n + i)) else Nil)
    assert(got == walk(0))
  }

  test("bfs expand leaves no per-level frontier caches behind (crawler_test.go:634 leak bound analogue)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val all = Bfs.expand[Int](spark, Seq(0),
      n => if (n < 13) Seq(3 * n + 1, 3 * n + 2, 3 * n + 3) else Seq.empty)
    assert(all.count() > 0)
    val after = spark.sparkContext.getPersistentRDDs.size
    // Only the returned snapshot may add storage; the per-level frontier
    // caches (one per tree depth before the fix) must all be released.
    assert(after <= before + 1,
      s"persisted RDDs grew $before -> $after; frontier caches leaked")
  }

  test("resumable BFS: full crawl == in-memory expand; finished state never re-expands") {
    import spark.implicits._
    def kids(n: Int) = if (n < 13) Seq(3 * n + 1, 3 * n + 2, 3 * n + 3) else Seq.empty
    val path = Files.createTempDirectory("bfsres").toString
    val got = Bfs.expandResumable[Int](spark, Seq(0), kids, path).collect().toSet
    val want = Bfs.expand[Int](spark, Seq(0), kids).collect().toSet
    assert(got == want, "at-rest crawl must equal the in-memory expansion")
    // a finished crawl is served from the stored levels: children must
    // never be invoked again (a poisoned expander proves it)
    val again = Bfs.expandResumable[Int](spark, Seq(0),
      (_: Int) => sys.error("children called on a finished crawl"), path)
    assert(again.collect().toSet == want)
  }

  test("resumable BFS: a budget stop resumes where it left; completed levels are not rewritten") {
    import spark.implicits._
    def kids(n: Int) = if (n < 13) Seq(3 * n + 1, 3 * n + 2, 3 * n + 3) else Seq.empty
    val path = Files.createTempDirectory("bfsres2").toString
    val partial = Bfs.expandResumable[Int](spark, Seq(0), kids, path,
      maxLevels = 2).collect().toSet
    assert(partial == Set(0, 1, 2, 3) ++ (1 to 3).flatMap(n =>
      Seq(3 * n + 1, 3 * n + 2, 3 * n + 3)),
      s"two levels exactly: $partial")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtime(k: Int) = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$path/level-$k/_SUCCESS"))
      .getModificationTime
    val (m0, m1) = (mtime(0), mtime(1))
    // simulate a crash mid-level-3: an uncommitted directory with wrong
    // content must be invisible and overwritten on resume
    Seq(999).toDF("value").write.parquet(s"$path/level-3")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/level-3/_SUCCESS"), false)
    val full = Bfs.expandResumable[Int](spark, Seq(0), kids, path)
      .collect().toSet
    val want = Bfs.expand[Int](spark, Seq(0), kids).collect().toSet
    assert(full == want, "resume must recompute only the torn level")
    assert(!full.contains(999), "torn uncommitted content must be discarded")
    assert(mtime(0) == m0 && mtime(1) == m1,
      "completed levels are append-only - resume must not rewrite them")
  }

  test("gzipped files crawl transparently (web-archive ingestion shape)") {
    import spark.implicits._
    import java.util.zip.GZIPOutputStream
    val root = Files.createTempDirectory("crawlgz")
    def gz(name: String, content: String): Unit = {
      val out = new GZIPOutputStream(Files.newOutputStream(root.resolve(name)))
      out.write(content.getBytes("UTF-8")); out.close()
    }
    gz("a.json.gz", """{"data": 40}""")
    gz("b.json.gz", """{"data": 2}""")
    Files.writeString(root.resolve("c.json"), """{"data": 1}""") // mixed plain
    val res = Crawl.collect[Rec, Long](spark, root.toString, schema,
      MonoidAggregator.sumLong[Rec](_.data))
    assert(res.result == 43L)
    assert(res.corruptFiles == 0L && res.firstError.isEmpty)
  }

  test("listing terminates and dedupes through a directory-symlink cycle") {
    val root = Files.createTempDirectory("crawlsym")
    val sub = Files.createDirectory(root.resolve("sub"))
    Files.writeString(root.resolve("top.json"), """{"data": 1}""")
    Files.writeString(sub.resolve("deep.json"), """{"data": 2}""")
    // sub/loop -> root: without the resolved-path visited set the walk
    // descends root/sub/loop/sub/loop/... forever.
    Files.createSymbolicLink(sub.resolve("loop"), root)
    val listing = Crawl.listWithErrors(spark, root.toString)
    assert(listing.errors.isEmpty)
    // Each real file listed exactly once, under its first-seen path.
    assert(listing.files.length == 2)
    assert(listing.files.count(_.endsWith("top.json")) == 1)
    assert(listing.files.count(_.endsWith("deep.json")) == 1)
  }

  test("accessProbe=false lists permission-locked files instead of pre-flight erroring") {
    import java.nio.file.attribute.PosixFilePermissions
    val root = Files.createTempDirectory("crawlnoprobe")
    Files.writeString(root.resolve("open.json"), """{"data": 1}""")
    val locked = Files.writeString(root.resolve("locked.json"), """{"data": 2}""")
    Files.setPosixFilePermissions(locked, PosixFilePermissions.fromString("---------"))
    val probed = Crawl.listWithErrors(spark, root.toString)
    assert(probed.files.length == 1 && probed.errors.count(_.op == "open") == 1)
    // Object-store mode: no per-file metadata RPC, no pre-flight open check.
    val unprobed = Crawl.listWithErrors(spark, root.toString, accessProbe = false)
    assert(unprobed.files.length == 2 && unprobed.errors.isEmpty)
  }
}
