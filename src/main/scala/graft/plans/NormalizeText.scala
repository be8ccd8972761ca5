package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native expression with whole-stage
  * codegen: NFC canonical composition, lowercasing, and whitespace
  * collapse (runs of Unicode whitespace → one ASCII space, ends trimmed)
  * in one pass — the canonicalization every dedup/fingerprint pipeline
  * runs first, so "café" typed with a combining accent, different case,
  * or doubled spaces hashes identically to its composed form.
  *
  * NFC (not NFKC) so the operation matches DuckDB's `nfc_normalize` and
  * stays SQL-oracle-checkable; compatibility foldings (ﬁ → fi) are a
  * lossier, separate policy choice. Codegen emits one static call — the
  * expression never breaks a WholeStageCodegen span the way a Scala UDF
  * would.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(graft.plans.NormalizeText.normalize(" +
        s"$c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object NormalizeText {

  /** NFC → lowercase → collapse whitespace runs → trim. Static so both
    * the interpreted and generated paths call the same kernel.
    */
  def normalize(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def normalizeText(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}
