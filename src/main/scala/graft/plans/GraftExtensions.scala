package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring for graft's native expressions — lets a
  * deployment enable them at session build time
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), making
  * `graft_cosine` / `graft_sorted_jaccard` / `graft_winnow` first-class SQL
  * functions on every session without per-session registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - fused cosine similarity of two numeric arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_jaccard"),
      info("graft_sorted_jaccard", "graft_sorted_jaccard(a, b) - Jaccard of two sorted distinct bigint arrays"),
      (exprs: Seq[Expression]) => SortedJaccard(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(text) - winnowing fingerprint sketch (k=3, w=4)"),
      (exprs: Seq[Expression]) => Winnow(exprs.head, 3, 4)))
    // Optimizer rule: users who write the composable HOF cosine get the
    // fused native kernel automatically (see RewriteCosine).
    ext.injectOptimizerRule(_ => RewriteCosine)
  }
}
