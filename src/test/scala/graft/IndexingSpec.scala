package graft

import graft.operators.Indexing

class IndexingSpec extends SparkSpec {

  test("globalIds assigns contiguous 0..n-1 in sort order") {
    import spark.implicits._
    val df = Seq(("b", 2L), ("a", 9L), ("b", 1L), ("a", 3L)).toDF("g", "k")
    val got = Indexing.globalIds(df, Seq("g", "k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(got.toSeq == Seq(
      ("a", 3L, 0L), ("a", 9L, 1L), ("b", 1L, 2L), ("b", 2L, 3L)))
  }

  test("globalIds is invariant to input partitioning") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 13, i)).toDF("g", "k")
    def ids(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      Indexing.globalIds(d, Seq("g", "k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    val a = ids(df)
    val b = ids(df.repartition(17))
    assert(a == b)
    assert(a.map(_._3) == (0L until 1000L))
    // ids follow the (g, k) total order
    assert(a.map(t => (t._1, t._2)) == a.map(t => (t._1, t._2)).sorted)
  }

  test("globalIds on an empty frame returns an empty frame with the id column") {
    import spark.implicits._
    val df = Seq.empty[(String, Long)].toDF("g", "k")
    val out = Indexing.globalIds(df, Seq("g", "k"))
    assert(out.columns.toSeq == Seq("g", "k", "gid"))
    assert(out.count() == 0)
  }

  test("rendezvousShard: balanced, stable, and minimally disruptive on growth") {
    import spark.implicits._
    val keys = (0L until 5000L).toDF("k")
    def assign(n: Int): Map[Long, Int] =
      Indexing.rendezvousShard(keys, "k", n)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val at4 = assign(4)
    // all shards used, roughly balanced (hash uniformity)
    val sizes = at4.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keys.toSet == Set(0, 1, 2, 3))
    assert(sizes.values.forall(s => s > 1000 && s < 1500), sizes.toMap)
    // the rendezvous guarantee: growing 4 -> 5 only ever moves a key TO
    // the new shard, never between existing shards
    val at5 = assign(5)
    val moved = at4.keys.filter(k => at4(k) != at5(k))
    assert(moved.forall(k => at5(k) == 4), "a key migrated between old shards")
    // expected 1/5 of keys move; allow generous slack
    assert(moved.size > 700 && moved.size < 1300, s"moved=${moved.size}")
    // deterministic across partitionings
    val re = Indexing.rendezvousShard(keys.repartition(13), "k", 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re == at4)
  }
}
