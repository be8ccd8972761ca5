package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Signed-random-projection LSH bucket keys as a native expression: for
  * each of `tables` hash tables, the key packs `planesPerTable` sign bits
  * of hyperplane dot products into one long — all tables in a single
  * O(planes · dim) register loop per row.
  *
  * Why an expression: the composable form evaluates one interpreted
  * `aggregate(zip_with(v, plane, *), 0, +)` PER PLANE — 32 zip-array
  * allocations and ~2k interpreted lambda calls per row — then builds a
  * bit STRING and substrings it per table. Sign bits are identical to
  * that form (same planes, same ascending-index double accumulation), so
  * bucket partitions — and therefore LSH recall — are unchanged; only
  * the key representation (packed long vs substring) differs, which is
  * internal to the band join.
  *
  * Accepts float or double array input; null, empty, or
  * wrong-dimension vectors → null (excluded from bucketing). Codegen
  * emits one static kernel call, keeping the key projection inside its
  * WholeStageCodegen span.
  */
case class SrpBuckets(
    child: Expression, planes: Seq[Seq[Double]], planesPerTable: Int)
  extends UnaryExpression {

  require(planesPerTable > 0 && planesPerTable <= 63,
    s"planesPerTable out of (0,63]: $planesPerTable")
  require(planes.nonEmpty && planes.length % planesPerTable == 0,
    s"planes (${planes.length}) must be a multiple of planesPerTable ($planesPerTable)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty or dimension-mismatched input evals to null, so nullability
  // cannot be inherited from the child (the optimizer would fold the
  // downstream isNotNull guards away and let null keys flow into the
  // bucket join)
  override def nullable: Boolean = true

  @transient private lazy val p: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    SrpBuckets.compute(input.asInstanceOf[ArrayData], p, planesPerTable, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", p, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} =
        graft.plans.SrpBuckets.compute($c, $planesRef, $planesPerTable, $isFloat);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_srp_buckets"
}

object SrpBuckets {
  /** The bucket-key kernel — static so the interpreted and generated
    * paths run the same code. Empty or wrong-dimension input → null: a
    * vector of the wrong dimension has no meaningful sign bits and is
    * excluded, like the declarative zip_with form, rather than silently
    * bucketed by a truncated dot product.
    */
  def compute(
      arr: ArrayData, p: Array[Array[Double]], planesPerTable: Int,
      isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n == 0 || n != p(0).length) return null
    val tables = p.length / planesPerTable
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < planesPerTable) {
        val plane = p(t * planesPerTable + j)
        var dot = 0.0
        var i = 0
        if (isFloat) while (i < n) { dot += arr.getFloat(i).toDouble * plane(i); i += 1 }
        else while (i < n) { dot += arr.getDouble(i) * plane(i); i += 1 }
        if (dot >= 0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  def srpBuckets(v: Column, planes: Seq[Seq[Double]], planesPerTable: Int): Column =
    ColumnBridge.column(
      SrpBuckets(ColumnBridge.expression(v), planes, planesPerTable))
}
