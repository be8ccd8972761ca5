package graft

import org.apache.spark.sql.SparkSession

/** Session-extension wiring: a session built with GraftExtensions resolves
  * the native functions from SQL text without registration calls.
  */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions session resolves graft_* SQL functions") {
    // create(), not getOrCreate(): an active session would be returned
    // as-is and the extensions silently ignored
    spark.sparkContext
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.plans.GraftExtensions)
      .create()
    try {
      val cos = s2.sql(
        "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val jac = s2.sql(
        "SELECT graft_sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .head().getDouble(0)
      assert(math.abs(jac - 0.5) < 1e-12)
      val sk = s2.sql("SELECT graft_winnow('a b c d e f g h') AS s").head().getSeq[Long](0)
      assert(sk.nonEmpty)
    } finally ()
  }
}
