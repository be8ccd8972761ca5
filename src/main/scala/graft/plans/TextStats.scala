package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-quality features as a native expression returning
  * `struct<n_tokens, alpha_ratio, stopword_ratio, distinct_ratio,
  * quality_score>`.
  *
  * The composable form re-tokenizes per reference (lambda-bearing
  * expressions are excluded from Catalyst subexpression elimination, and
  * each `when(nTok === 0, ...)` guard plus ratio references the token
  * array again) and pays a full `regexp_replace` just to count alphabetic
  * characters. This kernel computes every feature in one scan; codegen
  * emits one static kernel call so projections containing it stay inside
  * their WholeStageCodegen span.
  *
  * Semantics are kept bit-identical to
  * [[graft.operators.TextAnalysis.qualityColumnsDeclarative]] and the
  * DuckDB oracle: tokens are space-delimited runs; alpha ratio counts
  * `[A-Za-z]` over codepoint length; stopwords are the flattened marker
  * table; ratios are single double divisions in the same operand order;
  * the composite is `len_ok*0.4 + alpha*0.2 + stop*0.2 + distinct*0.2`
  * evaluated left-to-right.
  */
case class TextStats(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("distinct_ratio", DoubleType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_text_stats"
}

object TextStats {
  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextAnalysis.markers.values.flatten.foreach(s.add)
    s
  }

  /** The text-stats kernel — static so the interpreted and generated
    * paths run the same code. Never returns null.
    */
  def compute(input: UTF8String): InternalRow = {
    val text = input.toString
    val len = text.length
    // alpha ratio over codepoints (Java length counts UTF-16 units; the
    // declarative length() and DuckDB length() count codepoints)
    var alpha = 0
    var cp = 0
    var i = 0
    while (i < len) {
      val c = text.codePointAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      cp += 1
      i += Character.charCount(c)
    }
    var nTok = 0L
    var stop = 0L
    val seen = new java.util.HashSet[String]()
    i = 0
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && text.charAt(i) != ' ') i += 1
      if (i > start) {
        val tok = text.substring(start, i)
        nTok += 1
        if (stopwords.contains(tok)) stop += 1
        seen.add(tok)
      }
    }
    val alphaRatio = if (cp == 0) 0.0 else alpha.toDouble / cp.toDouble
    val stopRatio = if (nTok == 0) 0.0 else stop.toDouble / nTok.toDouble
    val distinctRatio = if (nTok == 0) 0.0 else seen.size.toDouble / nTok.toDouble
    val lenOk = if (nTok >= 10 && nTok <= 100000) 1.0 else 0.0
    val score = lenOk * 0.4 + alphaRatio * 0.2 + stopRatio * 0.2 + distinctRatio * 0.2
    InternalRow(nTok, alphaRatio, stopRatio, distinctRatio, score)
  }

  def apply(text: Column): Column =
    ColumnBridge.column(new TextStats(ColumnBridge.expression(text)))
}
