package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one EventStreams-shaped stream to memory and print the
  * engine's own per-batch duration breakdown (triggerExecution,
  * queryPlanning, addBatch, walCommit, stateOperators) — the §1.5
  * decomposition for the stream_* family's fixed cost.
  *
  * Usage: sbt "Test/runMain graft.StreamProbe [state|tumbling|dedup|static]"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("state")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.EventStreams
    (1 to 3).foreach { iter =>
      val t0 = System.nanoTime()
      val df = which match {
        case "state" => EventStreams.userRunningTotals(
          spark, EventStreams.readEvents(spark, d)).toDF()
        case "tumbling" => EventStreams.tumblingCounts(
          EventStreams.readEvents(spark, d), "1 hour", "2 hours")
        case "dedup" => EventStreams.dedupEvents(
          EventStreams.readEvents(spark, d), keys = Seq("user_id", "event_type"))
          .groupBy("event_type").count()
        case "static" =>
          val dim = spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(d).filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
            .select("user_id").distinct()
          EventStreams.enrichWithStatic(
            EventStreams.readEvents(spark, d), dim, Seq("user_id"))
            .groupBy("event_type").count()
      }
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val shm = java.nio.file.Files.createTempDirectory(
        new java.io.File("/dev/shm").toPath, "probe_ck_")
      val mode = if (which == "dedup" || which == "static") "complete"
        else if (which == "tumbling") "complete" else "update"
      val q = df.writeStream.outputMode(mode).format("memory")
        .queryName(s"probe_$iter")
        .option("checkpointLocation", shm.toString).start()
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"=== $which iter $iter total ${sec}%.2f s, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach(so => println(
          s"    state: commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes} " +
            s"rowsUpdated=${so.numRowsUpdated}"))
      }
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.catalog.dropTempView(s"probe_$iter")
    }
    spark.stop()
  }
}
