package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed monoid aggregation kernel — the Spark image of the reference's
  * `Accumulator` + `Combiner` pair (reference: `internal/workerpool/pool.go:12`
  * accumulator type, `internal/filecrawler/crawler.go:32` combiner type,
  * monoid contract at `crawler.go:31-32` and `crawler.go:40-43`).
  *
  * The reference splits aggregation into a per-worker partial fold
  * (`pool.go:71-121`, zero-init at `pool.go:72`) and a single-threaded final
  * combine (`crawler.go:75-91`). Spark's `Aggregator` has exactly that shape:
  * `zero`/`reduce` run as the partial `HashAggregateExec` on each partition
  * (map-side combine — no shuffle of raw rows), and `merge` combines the
  * per-partition partials after a shuffle of one row per partition.
  *
  * Contract difference vs the reference (documented in SURVEY.md §4.3): the
  * reference promises a single-threaded combiner; Spark may run `merge` on
  * several threads over different partial pairs. We therefore require what
  * the reference already assumes — associativity with `zero` as identity —
  * plus instance independence (no shared mutable state between buffers).
  */
final case class MonoidAggregator[T, R: Encoder](
    zeroValue: R,
    reduceFn: (R, T) => R,
    mergeFn: (R, R) => R)
  extends Aggregator[T, R, R] {

  override def zero: R = zeroValue
  override def reduce(acc: R, row: T): R = reduceFn(acc, row)
  override def merge(a: R, b: R): R = mergeFn(a, b)
  override def finish(r: R): R = r
  override def bufferEncoder: Encoder[R] = implicitly[Encoder[R]]
  override def outputEncoder: Encoder[R] = implicitly[Encoder[R]]

  /** Use in `ds.select(...)` / `ds.agg(...)`. */
  def column: TypedColumn[T, R] = this.toColumn
}

object MonoidAggregator {
  import org.apache.spark.sql.Encoders

  /** Sum monoid over a numeric projection — the reference demo's shape
    * (`cmd/app/app.go:21-30`: `accum.Sum += current.Data`).
    */
  def sumLong[T](f: T => Long): MonoidAggregator[T, Long] =
    MonoidAggregator[T, Long](0L, (acc, t) => acc + f(t), _ + _)(Encoders.scalaLong)

  def sumDouble[T](f: T => Double): MonoidAggregator[T, Double] =
    MonoidAggregator[T, Double](0.0, (acc, t) => acc + f(t), _ + _)(Encoders.scalaDouble)
}
