package graft

import graft.functions.TopKAggregator

case class KV(k: Long, v: Long)

class TopKSpec extends SparkSpec {

  private val ord = Ordering.by[KV, (Long, Long)](x => (x.v, -x.k))

  test("monoid laws: bounded sorted top-k list (zero identity, merge associative)") {
    val agg = TopKAggregator[KV](3, ord)(null)
    val rnd = new scala.util.Random(9)
    def randList(): Seq[KV] = {
      val xs = Seq.fill(rnd.nextInt(6))(KV(rnd.nextInt(100).toLong, rnd.nextInt(50).toLong))
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    for (_ <- 1 to 200) {
      val (a, b, c) = (randList(), randList(), randList())
      assert(agg.merge(agg.zero, a) == a && agg.merge(a, agg.zero) == a)
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
    }
  }

  test("reduce+merge equals global sort-take regardless of split") {
    val agg = TopKAggregator[KV](4, ord)(null)
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 100) {
      val xs = Seq.fill(50)(KV(rnd.nextInt(1000).toLong, rnd.nextInt(200).toLong))
      val expect = xs.sorted(ord.reverse).take(4)
      val parts = xs.grouped(1 + rnd.nextInt(10)).toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged == expect)
    }
  }

  test("distributed top-k agg equals window rank (q05 vs q40 shape)") {
    val q05 = SparkEntry.queries("q05_window_rank")(spark, sfDir).collect().toSeq
    val q40 = SparkEntry.queries("q40_topk_agg")(spark, sfDir)
      .select("o_custkey", "o_orderkey", "rnk").collect().toSeq
    assert(q40.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))) ==
      q05.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))))
  }

  test("Misra-Gries: every item above n/(k+1) survives; counts never overshoot") {
    import graft.functions.HeavyHittersAggregator
    val agg = HeavyHittersAggregator(10)
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 50) {
      // zipf-ish stream: a few hot tokens + a long uniform tail
      val xs = Seq.fill(2000)(
        if (rnd.nextInt(10) < 6) s"hot${rnd.nextInt(3)}"
        else s"cold${rnd.nextInt(500)}")
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size
      val bound = n / 11 // n / (k+1)
      // random merge tree over random partitionings
      val parts = xs.grouped(1 + rnd.nextInt(100)).toSeq
      val summary = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(summary.size <= 10)
      for ((t, c) <- exact if c > bound)
        assert(summary.contains(t), s"lost heavy hitter $t ($c > $bound)")
      for ((t, c) <- summary) {
        assert(c <= exact(t), s"overshoot: $t reported $c, true ${exact(t)}")
        assert(c >= exact(t) - bound, s"undershoot past bound: $t $c vs ${exact(t)}")
      }
    }
  }

  test("Misra-Gries runs distributed as a typed Aggregator") {
    import graft.functions.HeavyHittersAggregator
    import spark.implicits._
    val tokens = (1 to 3000).map(i =>
      if (i % 3 != 0) s"hot${i % 2}" else s"cold$i")
    val ds = spark.createDataset(tokens).repartition(13)
    val summary = ds.select(HeavyHittersAggregator(8).toColumn).head()
    assert(summary.contains("hot0") && summary.contains("hot1"))
    assert(summary.size <= 8)
  }
}
