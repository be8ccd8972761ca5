package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused cosine similarity over two numeric array columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The composable form (`aggregate(zip_with(a, b, *), 0.0, +)` three times —
  * [[graft.functions.VectorOps.cosine]]) materializes an intermediate array
  * and runs three lambda-driven folds per row; this expression is a single
  * allocation-free loop accumulating dot, |a|² and |b|² together — the shape
  * that matters when scoring billions of vectors in an ANN sweep.
  *
  * Semantics (kept bit-identical to the HOF form so either can serve the
  * declared queries): elements are widened to double; result is
  * dot / (sqrt(na) * sqrt(nb)), 0.0 when either norm is 0; a null element
  * anywhere in either array yields NULL (null propagates through the HOF
  * form's zip_with/aggregate, so the fused kernel must do the same — the
  * element-null scan is only emitted when the array type says
  * containsNull, so the codegen fast path for null-free schemas is
  * unchanged); the shorter length wins if the arrays disagree.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects array arguments, got $other")
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  private def hasNullElement(ad: ArrayData): Boolean = {
    var i = 0
    val n = ad.numElements()
    while (i < n) { if (ad.isNullAt(i)) return true; i += 1 }
    false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects numeric arrays, got ${left.dataType}, ${right.dataType}")
  }

  private def get(ad: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => ad.getFloat(i).toDouble
    case DoubleType => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType => ad.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, ta) = (a.asInstanceOf[ArrayData], elemType(left))
    val (lb, tb) = (b.asInstanceOf[ArrayData], elemType(right))
    if ((elemNullable(left) && hasNullElement(la)) ||
        (elemNullable(right) && hasNullElement(lb))) return null
    val n = math.min(la.numElements(), lb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(la, ta, i); val y = get(lb, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private def genGet(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val hasNull = ctx.freshName("hasNull")
      // Element-null guard loops are emitted only for containsNull array
      // types: null-free schemas keep the branch-free fast path.
      def guard(arr: String, nullable: Boolean): String =
        if (!nullable) ""
        else s"""for (int $j = 0; $j < $arr.numElements() && !$hasNull; $j++) {
                |  $hasNull = $arr.isNullAt($j);
                |}""".stripMargin
      val guards =
        if (!elemNullable(left) && !elemNullable(right)) ""
        else s"""boolean $hasNull = false;
                |${guard(a, elemNullable(left))}
                |${guard(b, elemNullable(right))}
                |if ($hasNull) { ${ev.isNull} = true; } else {""".stripMargin
      val close = if (guards.isEmpty) "" else "}"
      s"""
         |$guards
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genGet(elemType(left), a, i)};
         |  double $y = ${genGet(elemType(right), b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |$close
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points + SQL registration for graft's native
  * expressions.
  */
object GraftFunctions {

  /** Fused codegen cosine similarity (see [[CosineSimilarity]]). */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `graft_cosine` for use from SQL text. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimilarity(exprs.head, exprs(1)),
      "scala_udf")
}
