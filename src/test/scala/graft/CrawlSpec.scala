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
}
