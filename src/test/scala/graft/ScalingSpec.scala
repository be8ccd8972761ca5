package graft

import graft.sources.Crawl

/** Analogues of the reference's CI-enforced relative assertions
  * (BASELINE.md): per-stage parallelism must actually help, and
  * cancellation must interrupt a running job.
  */
class ScalingSpec extends SparkSpec {

  test("parallelism scaling: 8 partitions beat 1 partition >=2x on a slow map (crawler_test.go:147-201 analogue)") {
    import spark.implicits._
    def run(parts: Int): Double = {
      val t0 = System.nanoTime()
      spark.createDataset(1 to 8).repartition(parts)
        .mapPartitions { it => it.map { i => Thread.sleep(200); i } }
        .reduce(_ + _)
      (System.nanoTime() - t0) / 1e9
    }
    run(8) // warm
    val serial = run(1)
    val parallel = run(8)
    assert(serial / parallel >= 2.0,
      f"expected >=2x speedup, got serial=$serial%.2f parallel=$parallel%.2f")
  }

  test("maxPartitionBytes knob changes decode task counts (Configuration.FileWorkers analogue, crawler.go:17-21)") {
    import java.nio.file.Files
    import graft.functions.MonoidAggregator
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("data", LongType)))
    val root = Files.createTempDirectory("crawldop")
    for (i <- 0 until 64)
      Files.writeString(root.resolve(s"f$i.json"), s"""{"data": $i}""")

    import spark.implicits._

    def countTasks(knob: Option[Long]): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        Crawl.collect[Rec, Long](spark, root.toString, schema,
          MonoidAggregator.sumLong[Rec](_.data), maxPartitionBytes = knob)
        Thread.sleep(1500) // drain the async listener bus
        counter.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    // Default 128 MB splits pack all 64 tiny files into a few partitions;
    // a 4 MB cap (= the per-file open cost) forces ~one file per partition.
    val coarse = countTasks(None)
    val fine = countTasks(Some(4L * 1024 * 1024))
    assert(fine >= coarse * 3,
      s"expected the 4MB split cap to multiply task count, got $coarse -> $fine")
  }

  // NOTE on the reference's AccumulatorWorkers knob: Spark fuses decode and
  // the partial fold into one whole-stage-codegen task, so FileWorkers and
  // AccumulatorWorkers are a single knob (maxPartitionBytes, above) by
  // construction; the final combine is a single-partition merge of one
  // partial row per task — the reference's single-threaded combiner shape
  // (crawler.go:75-91). The >=2x parallelism test covers the fused stage.

  test("cancellation interrupts a running job group (O10, pool.go ctx checks)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future {
      Crawl.cancellable(spark, "cancel-me") {
        spark.createDataset(1 to 32).repartition(32)
          .mapPartitions { it => it.map { i => Thread.sleep(30000); i } }
          .reduce(_ + _)
      }
    }
    Thread.sleep(1500) // let tasks start
    Crawl.cancel(spark, "cancel-me")
    val caught = scala.util.Try(Await.result(fut, 20.seconds))
    assert(caught.isFailure, "cancelled job should fail, not complete")
  }
}
