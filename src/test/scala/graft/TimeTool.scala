package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time declared queries standalone, N iterations each, with
  * the bench session's geometry — for isolating one query's cost from
  * the full-suite bench (GC pressure, JIT state, co-tenant load all
  * differ there; this gives the query-alone floor).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "Test/runMain graft.TimeTool q37_map_funcs [iters]"
  */
object TimeTool {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeTool <query> [iters]")
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
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
    val q = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name iter $i: $sec%.3f s ($n rows)")
    }
    spark.stop()
  }
}
