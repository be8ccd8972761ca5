package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns using
  * Spark's higher-order functions (`zip_with` + `aggregate`), which stay in
  * codegen — no UDF, no serialization of the arrays to Scala objects.
  *
  * All math is done in double precision regardless of input element type so
  * results are stable across engines (the fixtures store `array<float>`).
  */
object VectorOps {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0, lit(0.0)).otherwise(d / n)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** All SRP sign bits at once as a "0101…" string. One literal plane
    * matrix + a single transform keeps the expression tree (and generated
    * code) small regardless of how many planes there are — the per-plane
    * variant above explodes codegen at 32+ planes.
    */
  def srpBitString(v: Column, planes: Seq[Seq[Double]]): Column = {
    val planesLit = typedlit(planes)
    concat_ws("",
      transform(planesLit, p =>
        when(aggregate(zip_with(asDouble(v), p, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) >= 0, lit("1")).otherwise(lit("0"))))
  }
}
