package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer et al., SIGMOD'03) as a native
  * expression with an O(tokens) imperative kernel.
  *
  * Pipeline per document: whitespace tokens → splitmix64 token hashes →
  * rolling polynomial hash over each k-token shingle → sliding-window
  * minimum over w consecutive shingle hashes via a monotonic deque (the
  * actual winnowing algorithm) → sorted distinct minima.
  *
  * Why an expression and not higher-order functions: the composable form
  * (`transform(sequence(...), i -> array_min(slice(hashes, i, w)))`) nests
  * lambdas three deep; Catalyst evaluates the inner array expression once
  * per *outer* element with no common-subexpression reuse, which is
  * O(n²·w) string work per document — measured 488 s on 5 000 docs where
  * this kernel takes under a second. Codegen emits one static kernel call
  * so projections containing it stay inside their WholeStageCodegen span.
  */
case class Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Winnow.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object Winnow {

  private def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def tokenHash(s: String, from: Int, until: Int): Long = {
    var h = 1469598103934665603L
    var i = from
    while (i < until) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
    mix64(h)
  }

  /** The winnowing kernel — static so the interpreted and generated paths
    * run the same code. Never returns null.
    */
  def compute(input: UTF8String, k: Int, w: Int): ArrayData = {
    val text = input.toString
    // token hashes without materializing token strings
    val th = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && text.charAt(i) != ' ') i += 1
      if (i > start) th += tokenHash(text, start, i)
    }
    val nTok = th.length
    // rolling polynomial shingle hashes: s_i = Σ th(i+j) * P^(k-1-j)
    val P = 0x100000001b3L
    val nSh = math.max(nTok - k + 1, 0)
    val sh = new Array[Long](nSh)
    var j = 0
    while (j < nSh) {
      var acc = 0L
      var m = 0
      while (m < k) { acc = acc * P + th(j + m); m += 1 }
      sh(j) = mix64(acc)
      j += 1
    }
    val out =
      if (nSh == 0) {
        if (nTok == 0) Array(mix64(0L)) else Array(th.min)
      } else if (nSh <= w) {
        Array(sh.min)
      } else {
        // monotonic deque sliding minimum, O(nSh)
        val mins = scala.collection.mutable.LinkedHashSet.empty[Long]
        val deque = new Array[Int](nSh)
        var head = 0; var tail = 0 // [head, tail)
        var p = 0
        while (p < nSh) {
          while (tail > head && sh(deque(tail - 1)) >= sh(p)) tail -= 1
          deque(tail) = p; tail += 1
          if (deque(head) <= p - w) head += 1
          if (p >= w - 1) mins += sh(deque(head))
          p += 1
        }
        mins.toArray
      }
    new GenericArrayData(out.distinct.sorted)
  }

  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(new Winnow(ColumnBridge.expression(text), k, w))
}
