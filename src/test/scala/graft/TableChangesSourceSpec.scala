package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType}

/** The change feed as a Structured Streaming source
  * (`format("graft-table-changes")`): offsets are table versions carried
  * by the engine's checkpoint WAL, `maxVersionsPerTrigger` bounds one
  * micro-batch's span across an AvailableNow drain (the
  * admission-control path, not a single capped batch), `startingVersion`
  * pins where a fresh stream begins, and misconfiguration fails loudly
  * at query start — never by silently skipping commits.
  */
class TableChangesSourceSpec extends SparkSpec {
  import spark.implicits._

  private def base(): String =
    Files.createTempDirectory("graft_cfsrc_spec").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(k => (k, k * 2.0, s"u${k % 7}")).toDF("k", "v", "u")

  /** One AvailableNow drain; returns (batchId -> distinct commit
    * versions in that batch) and appends consumed rows under `out`.
    */
  private def drain(path: String, ckpt: String, out: String,
      opts: Map[String, String]): Map[Long, Set[Long]] = {
    val seen = scala.collection.concurrent.TrieMap[Long, Set[Long]]()
    val q = opts.foldLeft(
        spark.readStream.format("graft-table-changes").option("path", path))(
        (r, kv) => r.option(kv._1, kv._2))
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val vs = b.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).toSet
        seen.put(id, vs)
        if (vs.nonEmpty) b.write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    seen.toMap
  }

  test("rate limit: six pending commits drain in three two-version batches; union exact") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), s"$p/t", zoneCols = Seq("k"),
      nFiles = 2, keepVersions = 8)
    (1 to 5).foreach(i => t.append(rows(100L * i, 100L * (i + 1))))
    assert(t.version == 6)

    val seen = drain(s"$p/t", s"$p/ckpt", s"$p/out",
      Map("maxVersionsPerTrigger" -> "2"))
    assert(seen.size == 3,
      s"6 pending versions at maxVersionsPerTrigger=2 must take 3 batches: $seen")
    assert(seen.values.forall(_.size == 2),
      s"every batch must span exactly two versions: $seen")
    assert(seen.values.reduce(_ ++ _) == (1L to 6L).toSet)

    // the feed is the create + appends verbatim: all inserts, exact rows
    val feed = spark.read.parquet(s"$p/out")
    assert(feed.filter(col("_change_type") =!= "insert").count() == 0)
    assert(feed.select("k").orderBy("k").collect().map(_.getLong(0)).toSeq
      == (0L until 600L).toSeq)
  }

  test("schema: table columns + _change_type + _commit_version; frame is streaming") {
    val p = base()
    GraftTable.create(rows(0, 10), s"$p/t", zoneCols = Seq("k"))
    val df = spark.readStream.format("graft-table-changes")
      .option("path", s"$p/t").load()
    assert(df.isStreaming, "load() must return a streaming frame")
    assert(df.schema.fieldNames.toSeq ==
      Seq("k", "v", "u", "_change_type", "_commit_version"))
    assert(df.schema("_change_type").dataType == StringType)
    assert(df.schema("_commit_version").dataType == LongType)
  }

  test("startingVersion=latest skips history; a live stream picks up later commits") {
    val p = base()
    val t = GraftTable.create(rows(0, 50), s"$p/t", zoneCols = Seq("k"),
      keepVersions = 8)
    t.append(rows(50, 100)) // history: must NOT be delivered
    val got = scala.collection.concurrent.TrieMap[Long, Long]()
    val q = spark.readStream.format("graft-table-changes")
      .option("path", s"$p/t").option("startingVersion", "latest")
      .load()
      .writeStream
      .option("checkpointLocation", s"$p/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        got.put(id, b.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.values.sum == 0, s"latest must skip history: $got")
      t.append(rows(100, 130)) // committed while the stream is live
      q.processAllAvailable()
      assert(got.values.sum == 30,
        s"the live stream must deliver exactly the new commit's rows: $got")
    } finally q.stop()
  }

  test("missing path and out-of-retention startingVersion fail loudly") {
    val e1 = intercept[Exception] {
      spark.readStream.format("graft-table-changes").load()
    }
    assert(e1.getMessage.contains("path"), e1.getMessage)

    // retention window: keepVersions=2, three commits -> v1 pruned;
    // consuming "from the beginning" would cross a feed gap
    val p = base()
    val t = GraftTable.create(rows(0, 10), s"$p/t", zoneCols = Seq("k"),
      keepVersions = 2)
    t.append(rows(10, 20))
    t.append(rows(20, 30))
    assert(t.versions().head > 1, "fixture must have pruned v1")
    val e2 = intercept[Exception] {
      drain(s"$p/t", s"$p/ckpt", s"$p/out", Map("startingVersion" -> "0"))
    }
    assert(e2.toString.contains("retention") ||
      Option(e2.getCause).exists(_.toString.contains("retention")),
      s"gap must be loud at query start: $e2")
  }
}
