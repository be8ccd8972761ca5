package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 64-bit hashes of a document's word n-gram shingles as a
  * native expression with an O(chars + s·log s) imperative kernel — the
  * shared input of every dedup variant.
  *
  * Why an expression: the composable form
  * (`array_sort(array_distinct(transform(shingles(text, n), xxhash64)))`
  * where `shingles` is itself a `transform(sequence(...), i ->
  * concat_ws(slice(tokens, i, n)))`) inlines the whole tokenizer INTO the
  * shingle lambda — Catalyst has no cross-lambda common-subexpression
  * reuse, so every document is re-tokenized once per shingle: O(tokens ·
  * chars) interpreted work that measured 253 s on a 505k-doc probe where
  * this kernel takes ~3 s. Same semantics: tokens are runs split on
  * spaces (the `split(text, " +")` contract, empties dropped), a shingle
  * is n consecutive tokens, hashes are a pure function of the token
  * sequence, output is sorted and distinct. Hash VALUES differ from the
  * old `xxhash64(string)` family — they are internal: every downstream
  * consumer (minhash/simhash signatures, prefix-filter inverted index,
  * Jaccard verification) is hash-agnostic, and hashed-set Jaccard equals
  * string-set Jaccard up to 64-bit collisions either way.
  *
  * Documents with fewer than n tokens yield an empty array (same as the
  * declarative form). Codegen emits one static kernel call — the
  * signature projection stays inside its WholeStageCodegen span instead
  * of forcing the whole stage interpreted (the CodegenFallback cost).
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {

  require(n > 0, s"shingle width must be positive: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {
  final val FnvBasis = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** The shingle kernel — static so the interpreted and generated paths
    * run the same code. Never null: < n tokens yields an empty array.
    */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    val len = s.length
    // per-token FNV-1a-then-mixed hashes, computed in one char scan
    val tokenHashes = new java.util.ArrayList[java.lang.Long](64)
    var i = 0
    var h = FnvBasis
    var inTok = false
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') {
        if (inTok) { tokenHashes.add(MinHashSig.mix(h)); h = FnvBasis; inTok = false }
      } else {
        h = (h ^ c) * FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) tokenHashes.add(MinHashSig.mix(h))
    val t = tokenHashes.size()
    val cnt = t - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](cnt)
    var j = 0
    while (j < cnt) {
      var sh = 0L
      var k = 0
      while (k < n) {
        sh = MinHashSig.mix(sh ^ tokenHashes.get(j + k).longValue())
        k += 1
      }
      out(j) = sh
      j += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place
    var w = 0
    var r = 0
    while (r < cnt) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == cnt) out else java.util.Arrays.copyOf(out, w))
  }

  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
