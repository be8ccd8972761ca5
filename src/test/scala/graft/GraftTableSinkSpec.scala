package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The streaming write half of the source/sink symmetry
  * (`df.writeStream.format("graft-table")`): micro-batches land as
  * ledgered transactional commits — exactly-once across checkpoint
  * restarts, create-on-first-batch with the batch id seeded into the
  * create commit, and a CDC-apply mode via `mergeKey`/`opCol`.
  */
class GraftTableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(): (String, String, String) = {
    val r = Files.createTempDirectory("graft_sink_spec").toString
    (s"$r/in", s"$r/tbl", s"$r/ckpt")
  }

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(k => (k, k * 2.0, s"u${k % 7}")).toDF("k", "v", "u")

  private def drain(in: String, schema: StructType, tbl: String,
      ckpt: String, opts: Map[String, String]): Unit = {
    val q = opts.foldLeft(
        spark.readStream.schema(schema).parquet(in).writeStream
          .format("graft-table").option("path", tbl)
          .option("checkpointLocation", ckpt))(
        (w, kv) => w.option(kv._1, kv._2))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally { if (q.isActive) q.stop() }
  }

  test("append sink: create-on-first-batch, exactly-once across restarts, ledger owned by the checkpoint") {
    val (in, tbl, ckpt) = dirs()
    rows(0, 100).coalesce(1).write.mode("append").parquet(in)
    val schema = rows(0, 1).schema
    drain(in, schema, tbl, ckpt, Map("zoneCols" -> "k"))
    val t = GraftTable.open(spark, tbl)
    assert(t.read().count() == 100)
    assert(t.lastAppliedBatch() >= 0L,
      "the first batch id must seed the ledger inside the create commit")
    // the checkpoint lineage OWNS the ledger: manual unledgered
    // mutations refuse, exactly like the API bootstrap
    val e = intercept[IllegalArgumentException] { t.append(rows(0, 1)) }
    assert(e.getMessage.contains("stream-ledgered"), e.getMessage)

    // nothing new -> no commit; new files -> exactly the delta lands
    val v = t.version
    drain(in, schema, tbl, ckpt, Map("zoneCols" -> "k"))
    assert(t.version == v, "an empty drain must not commit a version")
    rows(100, 150).coalesce(1).write.mode("append").parquet(in)
    drain(in, schema, tbl, ckpt, Map("zoneCols" -> "k"))
    assert(t.read().count() == 150)
    assert(t.read().select(sum("k")).head.getLong(0) ==
      (0L until 150L).sum)

    // output modes other than Append and partitionBy are loud
    intercept[Exception] {
      spark.readStream.schema(schema).parquet(in).writeStream
        .format("graft-table").option("path", tbl)
        .option("checkpointLocation", ckpt + "_pb")
        .partitionBy("u")
        .trigger(Trigger.AvailableNow()).start()
    }
  }

  test("mergeKey sink: CDC-apply — upserts latest-wins, opCol tombstones delete, exactly-once") {
    val (in, tbl, ckpt) = dirs()
    val mk = (k: Long, v: Double, op: String) => (k, v, op)
    Seq(mk(0, 0.0, "upsert"), mk(1, 1.0, "upsert"), mk(2, 2.0, "upsert"),
      mk(3, 3.0, "upsert"))
      .toDF("k", "v", "op").coalesce(1).write.mode("append").parquet(in)
    val schema = Seq((0L, 0.0, "x")).toDF("k", "v", "op").schema
    val opts = Map("mergeKey" -> "k", "opCol" -> "op")
    drain(in, schema, tbl, ckpt, opts)
    val t = GraftTable.open(spark, tbl)
    assert(t.read().orderBy("k").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (3L, 3.0)))
    assert(!t.read().columns.contains("op"), "opCol is consumed, not stored")

    // second batch: update k=1, delete k=3, insert k=9
    Seq(mk(1, 100.0, "upsert"), mk(3, -1.0, "delete"), mk(9, 9.0, "upsert"))
      .toDF("k", "v", "op").coalesce(1).write.mode("append").parquet(in)
    drain(in, schema, tbl, ckpt, opts)
    assert(t.read().orderBy("k").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 0.0), (1L, 100.0), (2L, 2.0), (9L, 9.0)))

    // redelivery-shaped restart: nothing new, nothing changes
    val v = t.version
    drain(in, schema, tbl, ckpt, opts)
    assert(t.version == v && t.read().count() == 4)
  }

  test("mergeKey sink: batch 0 honors the merge-key contract — duplicate seed keys refuse loudly") {
    val (in, tbl, ckpt) = dirs()
    // duplicate key 7 in the very first batch: merge() would refuse it
    // in batch 1, so the CREATE path must refuse it in batch 0 too —
    // not land it silently and corrupt the upsert state from birth
    (rows(0, 10) union rows(7, 8)).coalesce(1)
      .write.mode("append").parquet(in)
    val e = intercept[Exception] {
      drain(in, rows(0, 1).schema, tbl, ckpt, Map("mergeKey" -> "k"))
    }
    def hasUnique(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("unique")) ||
        hasUnique(t.getCause))
    assert(hasUnique(e), s"the seed-key contract must surface: $e")
    assert(!GraftTable.exists(spark, tbl),
      "a refused bootstrap must not leave a committed table")
  }
}
