package graft

import java.nio.file.Files
import graft.sources.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("partitioned parquet write enables partition pruning on read") {
    val out = Files.createTempDirectory("sink_part").toString
    val events = Tables.load(spark, sfDir, "events")
      .withColumn("etype", col("event_type"))
    Sinks.parquet(events, out, partitionBy = Seq("etype"))
    // hive-style layout exists
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("etype=")))
    // pruned read: PartitionFilters appear in the physical plan and results match
    val back = spark.read.parquet(out).filter(col("etype") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("etype"))
    assert(back.count() ==
      events.filter(col("event_type") === "click").count())
  }

  test("round-trip: csv and json writes read back with same row counts") {
    val outC = Files.createTempDirectory("sink_csv").toString
    val outJ = Files.createTempDirectory("sink_json").toString
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    Sinks.csv(docs, outC)
    Sinks.json(docs, outJ)
    assert(spark.read.option("header", "true").csv(outC).count() == 500)
    assert(spark.read.json(outJ).count() == 500)
  }

  test("blackhole sink materializes without output") {
    Sinks.blackhole(Tables.load(spark, sfDir, "lineitem").groupBy("l_returnflag").count())
  }
}
