package graft

import graft.functions.MonoidAggregator

/** Property tests for the monoid laws the reference *assumes*
  * (`crawler.go:31-32`: neutral element; `crawler.go:40-43`: associative
  * combiner) and for partial-fold + merge ≡ sequential fold — the
  * observable contract of the Accumulate/Combine split (`pool.go:71-121`,
  * `crawler.go:75-91`). Properties are exercised over seeded random cases.
  */
class MonoidSpec extends SparkSpec {

  private val sum = MonoidAggregator.sumLong[Long](identity)
  private val rnd = new scala.util.Random(42)

  test("monoid laws: zero is identity, merge associative") {
    for (_ <- 1 to 200) {
      val (a, b, c) = (rnd.nextLong(), rnd.nextLong(), rnd.nextLong())
      assert(sum.merge(sum.zero, a) == a)
      assert(sum.merge(a, sum.zero) == a)
      assert(sum.merge(sum.merge(a, b), c) == sum.merge(a, sum.merge(b, c)))
    }
  }

  test("partial folds + merge == sequential fold, any partition split") {
    for (_ <- 1 to 100) {
      val xs = List.fill(rnd.nextInt(500))(rnd.nextLong() % 1000L)
      val nParts = 1 + rnd.nextInt(8)
      val sequential = xs.foldLeft(sum.zero)(sum.reduce)
      val partials = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts))
        .map(_.foldLeft(sum.zero)(sum.reduce))
      val merged = partials.foldLeft(sum.zero)(sum.merge)
      assert(merged == sequential)
    }
  }

  test("distributed aggregation matches driver-side fold regardless of partitioning") {
    import spark.implicits._
    val xs = (1L to 1000L).toSeq
    for (parts <- Seq(1, 3, 32)) {
      val ds = spark.createDataset(xs).repartition(parts)
      assert(ds.select(sum.column).head() == xs.sum)
    }
  }

  test("zero rows yield the neutral element (pool.go:74-83 zero partials)") {
    import spark.implicits._
    val empty = spark.createDataset(Seq.empty[Long])
    assert(empty.select(sum.column).head() == 0L)
  }
}
