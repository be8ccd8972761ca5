package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a bounded aggregation (partial + final), the
  * scale-correct alternative to `row_number().over(window).filter(<= k)`:
  * the window form shuffles *every* row and sorts each key's full history,
  * while this aggregator keeps at most k elements per key on the map side
  * (the same Accumulate/Combine shape as the reference's monoid contract,
  * `crawler.go:31-43`, with "bounded sorted list of size k" as the monoid),
  * so the exchange carries k rows per key per partition at most.
  *
  * The buffer is a sorted Vector (descending by `ord`); insert and merge
  * truncate to k. For the k in real queries (tens) linear insert beats heap
  * constant factors.
  */
final case class TopKAggregator[T](k: Int, ord: Ordering[T])(
    implicit bufEnc: Encoder[Seq[T]])
  extends Aggregator[T, Seq[T], Seq[T]] {

  require(k > 0, "k must be positive")

  override def zero: Seq[T] = Vector.empty

  override def reduce(buf: Seq[T], t: T): Seq[T] = {
    if (buf.size == k && ord.gteq(buf.last, t)) buf
    else {
      val (hi, lo) = buf.span(x => ord.gteq(x, t))
      ((hi :+ t) ++ lo).take(k)
    }
  }

  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = {
    val out = Vector.newBuilder[T]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && ord.gteq(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[T]): Seq[T] = r
  override def bufferEncoder: Encoder[Seq[T]] = bufEnc
  override def outputEncoder: Encoder[Seq[T]] = bufEnc
}
