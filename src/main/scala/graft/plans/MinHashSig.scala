package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature over a 64-bit shingle-hash set as a native expression
  * with an O(|set| · k) imperative kernel.
  *
  * Why an expression and not the tall dataflow form: minhash needs the min
  * of k independent hash functions per document. The declarative shape —
  * posexplode k hashed copies of every shingle row, then a (doc, k)
  * min-aggregate — materializes and SHUFFLES |corpus shingles| · k rows:
  * at 500k docs × 38 shingles × k=128 that is 2.4 BILLION aggregate input
  * rows (measured 245 s), for what is arithmetically a tight register
  * loop. This kernel does the same math in one pass per row — the k-th
  * hash is the splitmix64 finalizer applied to `shingle ^ seed(k)`, the
  * standard one-base-hash + k-mixers construction — and returns the
  * signature array directly: no row blowup, no shuffle, ~20× faster at
  * probe scale. Same candidate-recall math as before (any good 64-bit
  * mixer family); pairs are still exact-verified downstream, so operator
  * OUTPUT is unchanged: the brute-force Jaccard pairs.
  *
  * Empty sets return null (an empty document has no signature and must
  * never enter a band bucket — all-empty docs would otherwise collide
  * into one giant candidate clique). Codegen emits one static kernel
  * call, so the signature projection stays inside its WholeStageCodegen
  * span.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty (non-null) input evals to null, so nullability cannot be
  // inherited from the child: with a non-nullable child the optimizer
  // would fold the downstream isNotNull guards to true and let empty
  // docs' null signatures flow into band buckets (or crash
  // UnsafeProjection on a non-nullable field)
  override def nullable: Boolean = true

  // per-k XOR seeds, fixed at plan construction
  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => MinHashSig.mix(0x9e3779b97f4a7c15L * (k + 1)))

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.MinHashSig.compute($c, $seedsRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  /** splitmix64 finalizer — the same mixer [[Winnow]] uses (Steele et al.,
    * "Fast splittable pseudorandom number generators", OOPSLA'14).
    */
  @inline final def mix(x: Long): Long = {
    var z = x
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The signature kernel — static so the interpreted and generated
    * paths run the same code. Empty input → null (see class doc).
    */
  def compute(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val numHashes = seeds.length
    val out = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val seed = seeds(k)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = mix(arr.getLong(i) ^ seed)
        if (v < mn) mn = v
        i += 1
      }
      out(k) = mn
      k += 1
    }
    new GenericArrayData(out)
  }

  def minHashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numHashes))
}

/** LSH band-bucket keys straight from the shingle-hash set: computes the
  * [[MinHashSig]] signature AND folds each band of r = numHashes/bands
  * consecutive signature values into one 64-bit bucket key, all in a
  * single kernel pass — the interpreted HOF alternative
  * (`transform(sequence(...), b -> xxhash64(slice(sig, b·r+1, r)))`)
  * allocated a slice array per band per row and dominated the probe
  * profile. Returns array<long>[bands]; empty sets → null.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
  extends UnaryExpression {

  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    s"bands ($bands) must divide numHashes ($numHashes)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null on empty input — see the [[MinHashSig.nullable]] rationale
  override def nullable: Boolean = true

  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => MinHashSig.mix(0x9e3779b97f4a7c15L * (k + 1)))

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], seeds, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.MinHashBands.compute($c, $seedsRef, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_bands"
}

object MinHashBands {
  /** The banded-signature kernel — static so the interpreted and
    * generated paths run the same code. Empty input → null.
    */
  def compute(arr: ArrayData, seeds: Array[Long], bands: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val r = seeds.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bh = 0x51ed2701a7e5cbd1L + b
      var kk = 0
      while (kk < r) {
        val seed = seeds(b * r + kk)
        var mn = Long.MaxValue
        var i = 0
        while (i < n) {
          val v = MinHashSig.mix(arr.getLong(i) ^ seed)
          if (v < mn) mn = v
          i += 1
        }
        bh = MinHashSig.mix(bh ^ mn)
        kk += 1
      }
      out(b) = bh
      b += 1
    }
    new GenericArrayData(out)
  }

  def minHashBands(hashes: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(
      MinHashBands(ColumnBridge.expression(hashes), numHashes, bands))
}

/** 64-bit SimHash over a shingle-hash set as a native expression: bit b of
  * the output is the sign of Σ over shingles of ±1 per bit b of the
  * shingle hash. Same rationale as [[MinHashSig]]: the tall form explodes
  * 64 (doc, bit) rows per shingle through a shuffle-aggregate — this is
  * one O(|set| · 64) register loop per row. Ties (sum == 0) resolve to
  * bit 0, matching the declarative `> 0` convention. Empty sets → null.
  */
case class SimHashSig(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  // null on empty input — see the [[MinHashSig.nullable]] rationale
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else SimHashSig.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.SimHashSig.compute($c);
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_sig"
}

object SimHashSig {
  /** The simhash kernel — static so the interpreted and generated paths
    * run the same code. Caller guarantees non-empty input.
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simHashSig(hashes: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(hashes)))
}
