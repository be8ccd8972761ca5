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

  test("RewriteCosine: HOF cosine pattern is fused into the native kernel") {
    // the shared session carries GraftExtensions since every engine
    // session builder injects them (Session.local/Verify/Bench) — the
    // fused plan is now the DEFAULT; the un-fused comparison comes from
    // excluding the injected rule, not from a second session (a new
    // session on the same context would inherit the extensions conf)
    import org.apache.spark.sql.functions.{col, reverse}
    // File-backed relation: over a LocalRelation the optimizer would
    // constant-fold the whole projection away before the rule could show.
    def q() =
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id"),
          graft.functions.VectorOps.cosine(
            col("embedding"), reverse(col("embedding"))).as("cos"))
    val fused = q()
    assert(fused.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("cosinesimilarity"),
      s"expected fused kernel in:\n${fused.queryExecution.optimizedPlan}")
    val key = "spark.sql.optimizer.excludedRules"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.RewriteCosine")
    try {
      // and the rewrite preserves results bit-for-bit vs the un-fused plan
      val plain = q()
      assert(!plain.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("cosinesimilarity"),
        s"rule exclusion must yield the declarative plan:\n" +
          s"${plain.queryExecution.optimizedPlan}")
      val want = plain.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = fused.collect()
      assert(got.nonEmpty)
      got.foreach(r => assert(r.getDouble(1) == want(r.getLong(0))))
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
