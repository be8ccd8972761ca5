package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries.
  *
  * Usage: sbt "Test/runMain graft.ExplainTool q54_resample text_decontaminate"
  * (no args = every query). SPARK_GRAFT_SF_DIR picks the fixture scale.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // same extensions as Bench/Verify — the SQL-door queries (MERGE/
      // UPDATE rewrites, CBO stats) cannot even plan without them
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, d).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
