package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE declared query with the bench session geometry and
  * print every Spark job it submitted (id, wall ms, description) — the
  * per-commit/per-micro-batch fixed-cost profile the optimization rounds
  * use as plan evidence (plans/rNN/..._jobs_*.txt).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   sbt "Test/runMain graft.JobsTool q_sql_merge"
  */
object JobsTool {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobsTool <query>")
    val name = args(0)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          lines.add((je.jobId, je.time - t0, desc))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    graft.sources.Sinks.blackhole(SparkEntry.queries(name)(spark, d))
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val all = lines.asScala.toSeq.sortBy(_._1)
    all.foreach { case (id, ms, desc) =>
      println(f"job $id%4d $ms%6d ms   | $desc")
    }
    println(f"TOTAL ${all.size} jobs, ${all.map(_._2).sum} ms job wall")
    spark.stop()
  }
}
