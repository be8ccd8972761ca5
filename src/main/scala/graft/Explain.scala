package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(8)
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
