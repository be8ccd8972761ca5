package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-stopword language ID as a native expression: one pass over the
  * document instead of the composable form's per-language `filter` +
  * `array_contains` lambdas, which Catalyst cannot common-subexpression-
  * eliminate across the decision `when`-chain (each of the ~16 score
  * references re-scans every token — measured ~10x this kernel's cost).
  *
  * Semantics are bit-identical to the declarative form in
  * [[graft.operators.TextAnalysis.langId]] and its DuckDB oracle:
  * any CJK codepoint in U+4E00..U+9FFF wins "zh"; otherwise tokens are
  * space-delimited runs and the language with the highest marker count
  * wins with deterministic tie order en > es > fr > de; "und" when no
  * marker matches. Codegen emits one static kernel call so projections
  * containing it stay inside their WholeStageCodegen span.
  */
case class LangId(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LangId.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_langid"
}

object LangId {
  // Language marker lists, flattened once: table(i) = (marker, langIdx).
  // A token may count toward several languages (e.g. "la" is both es and
  // fr), matching array_contains per list.
  private val langs = Seq("en", "es", "fr", "de")
  private val table: Array[(String, Int)] = (for {
    (lang, li) <- langs.zipWithIndex
    m <- graft.operators.TextAnalysis.markers(lang)
  } yield (m, li)).toArray

  @inline private def tokenIs(s: String, from: Int, until: Int, m: String): Boolean = {
    if (until - from != m.length) return false
    var i = 0
    while (i < m.length) {
      if (s.charAt(from + i) != m.charAt(i)) return false
      i += 1
    }
    true
  }

  /** The language-ID kernel — static so the interpreted and generated
    * paths run the same code. Never returns null.
    */
  def compute(input: UTF8String): UTF8String = {
    val text = input.toString
    val len = text.length
    val score = new Array[Int](4)
    var i = 0
    var cjk = false
    while (i < len && !cjk) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk = true
      i += 1
    }
    if (cjk) return UTF8String.fromString("zh")
    i = 0
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && text.charAt(i) != ' ') i += 1
      if (i > start) {
        var m = 0
        while (m < table.length) {
          val (marker, li) = table(m)
          if (tokenIs(text, start, i, marker)) score(li) += 1
          m += 1
        }
      }
    }
    val Array(en, es, fr, de) = score
    val lang =
      if (en >= es && en >= fr && en >= de && en > 0) "en"
      else if (es >= fr && es >= de && es > 0) "es"
      else if (fr >= de && fr > 0) "fr"
      else if (de > 0) "de"
      else "und"
    UTF8String.fromString(lang)
  }

  def apply(text: Column): Column =
    ColumnBridge.column(new LangId(ColumnBridge.expression(text)))
}
