package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters as a bounded aggregation (partial + final):
  * an O(k)-memory frequency summary with the classic deterministic
  * guarantee — every item occurring more than n/(k+1) times is present,
  * and each reported count under-estimates the true count by at most
  * n/(k+1) (never over-estimates). The streaming-sketch alternative to
  * an exact `groupBy(token).count()` when the token domain is far larger
  * than memory: the exact form shuffles one row per DISTINCT token, this
  * aggregator ships at most k counters per partition.
  *
  * Merge is the Agarwal et al. (2013) mergeable-summaries rule: sum
  * counters pairwise, then subtract the (k+1)-th largest counter from
  * all and drop the non-positive ones — the error bounds compose across
  * any merge tree, so the result contract is partition-order
  * independent (reported counts may vary within the bound; the
  * guarantees never do).
  */
final case class HeavyHittersAggregator(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all step: drop counters that reach zero
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) =>
        if (c - cut > 0) Some(t -> (c - cut)) else None
      }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    HeavyHittersAggregator.mapEncoder
  override def outputEncoder: Encoder[Map[String, Long]] =
    HeavyHittersAggregator.mapEncoder
}

object HeavyHittersAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val mapEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
