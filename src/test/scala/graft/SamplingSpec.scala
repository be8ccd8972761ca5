package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic hash-split invariants: stability under reshuffle and
  * corpus growth (the properties randomSplit lacks), plus fraction
  * accuracy on a large keyspace.
  */
class SamplingSpec extends SparkSpec {

  test("hash split is stable across repartitioning and corpus growth") {
    import spark.implicits._
    val base = (0L until 2000L).toDF("id")
    def labels(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "id", 0.8)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = labels(base)
    val b = labels(base.repartition(17))
    assert(a == b, "split must not depend on partitioning")
    // growing the corpus never migrates an existing key's split
    val grown = labels((0L until 4000L).toDF("id"))
    assert(a.forall { case (k, v) => grown(k) == v })
  }

  test("hash split fraction lands near the requested trainFrac") {
    import spark.implicits._
    val n = 20000L
    val counts = Sampling.hashSplit((0L until n).toDF("id"), "id", 0.75)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = counts("train").toDouble / n
    assert(math.abs(frac - 0.75) < 0.01, s"train fraction $frac too far from 0.75")
    assert(counts("train") + counts("val") == n)
  }

  test("splitting on a group column keeps every group whole (no leakage)") {
    import spark.implicits._
    val rows = (0L until 3000L).map(i => (i, s"group${i % 57}")).toDF("id", "grp")
    val crossing = Sampling.hashSplit(rows, "grp", 0.5)
      .groupBy("grp").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(crossing == 0, "a group straddled train and val")
  }

  test("stratifiedSample hits per-stratum fractions and nests across fractions") {
    import spark.implicits._
    val rows = (0L until 20000L).map(i => (i, if (i % 4 == 0) "big" else "small"))
      .toDF("id", "cls")
    def kept(fracBig: Double, fracSmall: Double): Map[String, Set[Long]] =
      Sampling.stratifiedSample(rows, "id", "cls",
          Map("big" -> fracBig), defaultFrac = fracSmall)
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val a = kept(0.5, 0.1)
    assert(math.abs(a("big").size / 5000.0 - 0.5) < 0.03)
    assert(math.abs(a("small").size / 15000.0 - 0.1) < 0.02)
    // same key hash both times: a lower fraction selects a SUBSET of a
    // higher one (what lets you downsample progressively without churn)
    val b = kept(0.25, 0.1)
    assert(b("big").subsetOf(a("big")))
    assert(b("small") == a("small"))
  }

  test("capPerGroup keeps exactly the top-n rows per group, deterministically") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, (i % 7).toString, i % 13)).toDF("id", "grp", "score")
    val capped = Sampling.capPerGroup(rows, "grp", 3,
      Seq(col("score").desc, col("id").asc))
    val got = capped.collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // oracle: per group, sort by (score desc, id) and take 3
    val want = (0L until 1000L).map(i => (i, (i % 7).toString, i % 13))
      .groupBy(_._2).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._1)).take(3).map(r => (g, r._1))
      }.toSet
    assert(got == want)
    // ties beyond the cap are excluded, row shape is preserved
    assert(capped.columns.toSeq == Seq("id", "grp", "score"))
  }

  test("importanceSample: clamped probs, monotone kept sets, stable under reshuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0L until 2000L).map(i => (i, (i % 100) / 80.0)).toDF("id", "p")
    def kept(d: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Sampling.importanceSample(d, "id", "p")
        .select("id").collect().map(_.getLong(0)).toSet
    val base = kept(df)
    // prob >= 1 (clamped) rows are always kept; prob 0 rows never
    assert((0L until 2000L).filter(i => (i % 100) / 80.0 >= 1.0).forall(base))
    assert((0L until 2000L).filter(i => i % 100 == 0).forall(i => !base(i)))
    // fraction tracks the mean clamped probability (0.595)
    assert(math.abs(base.size / 2000.0 - 0.595) < 0.05)
    // deterministic across partitioning
    assert(kept(df.repartition(11)) == base)
    // monotone: halving every probability only removes rows
    val halved = kept(df.withColumn("p", col("p") / 2))
    assert(halved.subsetOf(base))
  }

  test("winsorize caps at the ceil(p*n) order statistic per group") {
    import spark.implicits._
    // group a: values 1..10, p=0.8 → rank ceil(8)=8 → cap=8
    // group b: values 100,200,300, p=0.8 → rank ceil(2.4)=3 → cap=300 (no clip)
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 100L), ("b", 200L), ("b", 300L))).toDF("g", "v")
    val w = graft.operators.Sampling.winsorize(df, Seq("g"), "v", 0.8)
    val byG = w.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(byG("a").forall(_._3 == 8L))
    assert(byG("a").map(_._4).sum == (1 to 8).sum + 8 + 8) // 9,10 clipped to 8
    assert(byG("b").forall(t => t._3 == 300L && t._4 == t._2))
  }

  test("weightedSample: exact k per group, weight-proportional, reshuffle-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    // two groups; in "a" ids 0-99 carry weight 200, ids 100-999 weight 1
    val rows = (0 until 1000).map(i => ("a", i.toLong, if (i < 100) 200.0 else 1.0)) ++
      (0 until 50).map(i => ("b", 10000L + i, 1.0))
    val df = rows.toDF("g", "id", "w")
    def kept(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, "id", "w", Seq("g"), k = 20)
        .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val base = kept(df)
    assert(base.count(_._1 == "a") == 20 && base.count(_._1 == "b") == 20)
    // heavy rows are 100 of 1000 but carry >99% of total weight: the
    // sample must be dominated by them (deterministic given the hash)
    assert(base.count { case (g, id) => g == "a" && id < 100 } >= 15)
    // pure function of the key: partitioning cannot change the sample
    assert(kept(df.repartition(13)) == base)
    assert(kept(df.coalesce(1)) == base)
  }

  test("weightedSample: non-positive and null weights are excluded; equal weights = hash top-k") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = Seq((1L, Some(0.0)), (2L, Some(-3.0)), (3L, None), (4L, Some(1.0)))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", Seq.empty, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L))
    // with equal weights the priority is monotone in the hash weight, so
    // the sample is exactly the top-k keys by hashWeight
    val eq = (0 until 100).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val sample = Sampling.weightedSample(eq, "id", "w", Seq.empty, k = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    val topByHash = eq.select(col("id"),
        graft.operators.Sampling.hashWeight(col("id")).as("hw"))
      .orderBy(col("hw").desc).limit(7)
      .collect().map(_.getLong(0)).toSet
    assert(sample == topByHash)
  }

  test("negativeSamples: k per anchor, in range, never the anchor, reshuffle-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    val anchors = (0L until 100L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.negativeSamples(d, "id", n = 100L, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = run(anchors)
    assert(got.size == 500)
    assert(got.forall { case (_, _, neg) => neg >= 0 && neg < 100 })
    assert(got.forall { case (a, _, neg) => neg != a })
    assert(run(anchors.repartition(11)) == got)
    // draws cover the id space reasonably (hash uniformity sanity)
    assert(got.map(_._3).size > 50)
  }

  test("temperatureSample: rates follow (n/nmin)^(alpha-1); alpha=1 keeps all") {
    import spark.implicits._
    // three strata with 4:2:1 size skew
    val rows = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 600).map(i => (i.toLong, "mid")) ++
      (600 until 700).map(i => (i.toLong, "small"))).toDF("id", "g")
    val kept = Sampling.temperatureSample(rows, "g", "id", alpha = 0.5)
    val rates = kept.groupBy("g").agg(max("rate")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") == 1.0)
    assert(math.abs(rates("big") - math.pow(4.0, -0.5)) < 1e-6)
    assert(math.abs(rates("mid") - math.pow(2.0, -0.5)) < 1e-6)
    // the smallest stratum is never downsampled
    assert(kept.filter(col("g") === "small").count() == 100)
    // alpha = 1 is the identity
    assert(Sampling.temperatureSample(rows, "g", "id", alpha = 1.0)
      .count() == 700)
    // kept set is reshuffle-stable
    val a = kept.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(rows.repartition(13), "g", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("runningTotal/budgetTrim: matches the window cumsum, any partitioning") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (i.toLong, ((i * 37) % 91 + 1).toLong))
      .toDF("id", "w")
    val expect = rows.withColumn("cum",
        sum("w").over(org.apache.spark.sql.expressions.Window
          .orderBy(col("w").desc, col("id"))
          .rowsBetween(Long.MinValue, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Sampling.runningTotal(rows.repartition(7),
        Seq(col("w").desc, col("id")), "w", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
    // trim keeps exactly the prefix whose inclusive total fits the budget
    val budget = 5000L
    val keptIds = Sampling.budgetTrim(rows, Seq(col("w").desc, col("id")),
      "w", budget).select("id").collect().map(_.getLong(0)).toSet
    assert(keptIds == expect.filter(_._2 <= budget).keySet)
    // null weights cost nothing (sum semantics)
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "w")
    val cums = Sampling.runningTotal(withNull, Seq(col("id")), "w", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cums == Map(1L -> 10L, 2L -> 10L, 3L -> 15L))
  }

  test("kfold: k exhaustive balanced folds, group-whole, reshuffle-stable") {
    import spark.implicits._
    val rows = (0L until 5000L).map(i => (i, s"g${i % 97}")).toDF("id", "grp")
    val folds = Sampling.kfold(rows, "grp", k = 5)
    val byFold = folds.groupBy("fold").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFold.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // balanced within hash noise (97 groups of ~52 rows)
    assert(byFold.values.forall(n => n > 400 && n < 1700), byFold)
    // group-aware: every group lands in exactly one fold
    val crossing = folds.groupBy("grp")
      .agg(countDistinct("fold").as("nf")).filter(col("nf") > 1).count()
    assert(crossing == 0)
    // stable under repartitioning
    val a = folds.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Sampling.kfold(rows.repartition(11), "grp", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("purgedTimeFolds: contiguous equal folds, exact embargo window, reshuffle-stable") {
    import spark.implicits._
    // 100 rows at ts = 0..99, k = 4, embargo = 3: folds are the exact
    // quarters, and rows 25-27 / 50-52 / 75-77 sit within 3 s of the
    // previous fold's close (24 / 49 / 74) — nothing else is flagged
    val rows = (0L until 100L).map(i => (i, i)).toDF("id", "ts")
    def labels(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Any)] =
      Sampling.purgedTimeFolds(df, "ts", Seq("id"), k = 4, embargoSeconds = 3)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("fold"), r.get(r.fieldIndex("emb"))))).toMap
    val got = labels(rows)
    (0L until 100L).foreach { i =>
      assert(got(i)._1 == i / 25, s"row $i fold")
      val wantEmb: Any =
        if (i % 25 <= 2 && i >= 25) (i / 25 - 1) else null
      assert(got(i)._2 == wantEmb, s"row $i emb: got ${got(i)._2}")
    }
    // value-deterministic under any partitioning (the rank is a pure
    // function of the total order, not of the range boundaries)
    assert(labels(rows.repartition(7)) == got)
  }

  test("quantileNormalize: group ranks map onto global order statistics") {
    import spark.implicits._
    // group a: 1,2,3,4 — group b: 100,200 ; global sorted:
    // [1,2,3,4,100,200], N=6
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 100.0), ("b", 200.0)).toDF("g", "v")
    val got = Sampling.quantileNormalize(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // a: rk 0..3 of ng 4 -> pos = rk*5 div 3 = 0,1,3,5 -> 1,2,4,200
    // b: rk 0,1 of ng 2 -> pos = 0,5 -> 1,200 (extremes meet, as they must)
    assert(got == Set(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 4.0),
      ("a", 4.0, 200.0), ("b", 100.0, 1.0), ("b", 200.0, 200.0)))
    // ties within a group map to the SAME normalized value (RANK, not
    // row_number), and the result is partitioning-invariant
    val tied = Seq(("a", 5.0), ("a", 5.0), ("a", 7.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.quantileNormalize(d, Seq("g"), "v")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val base = run(tied)
    assert(base.filter(t => t._1 == "a" && t._2 == 5.0).map(_._3).toSet.size == 1)
    assert(run(tied.repartition(7)).toSet == base.toSet)
  }

  test("winsorize: null values keep null winsorized and never become the cap") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(5L)), ("a", None))
      .toDF("g", "v")
    val w = graft.operators.Sampling.winsorize(df, Seq("g"), "v", 1.0)
      .collect().map(r => (if (r.isNullAt(1)) null else r.getLong(1),
        r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3)))
    // cap = max of the non-null values
    assert(w.forall(_._2 == 5L))
    assert(w.collect { case (null, _, wz) => wz }.toSeq == Seq(null))
    assert(w.collect { case (v: Any, _, wz) => (v, wz) }.toMap ==
      Map(1L -> 1L, 5L -> 5L))
  }
}
