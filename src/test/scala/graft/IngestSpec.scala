package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions.col

class IngestSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert: batch wins on collision, untouched base rows survive") {
    val base = corpus(1L -> "a", 2L -> "b", 3L -> "c")
    val batch = corpus(2L -> "B", 4L -> "D")
    val out = asMap(Ingest.upsert(base, batch, Seq("id")))
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val base = corpus(1L -> "a", 2L -> "b")
    val batch = corpus(2L -> "B", 3L -> "C")
    val once = Ingest.upsert(base, batch, Seq("id"))
    val twice = Ingest.upsert(once, batch, Seq("id"))
    assert(asMap(once) == asMap(twice))
  }

  test("upsert with empty batch returns the base rows") {
    val base = corpus(1L -> "a")
    val out = asMap(Ingest.upsert(base, corpus(), Seq("id")))
    assert(out == Map(1L -> "a"))
  }

  test("upsert rejects an empty key list") {
    val df = corpus(1L -> "a")
    intercept[IllegalArgumentException](Ingest.upsert(df, df, Seq.empty))
  }

  test("diff classifies added/removed/changed/unchanged") {
    val before = corpus(1L -> "a", 2L -> "b", 3L -> "c")
    val after = corpus(2L -> "b", 3L -> "C", 4L -> "d")
    val got = Ingest.diff(before, after, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff compares attributes null-safely") {
    def snap(rows: (Long, Option[String])*) =
      spark.createDataFrame(rows).toDF("id", "text")
    val got = Ingest.diff(
        snap(1L -> None, 2L -> Some("x")),
        snap(1L -> None, 2L -> None), Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("profile reports nulls, distincts, and min/max per column") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(Seq[(Long, Option[String])](
        (3L, Some("b")), (1L, None), (2L, Some("a")), (4L, Some("a"))))
      .toDF("k", "s")
    val p = Ingest.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(p("k") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("tableDigest is order- and partitioning-independent, content-sensitive") {
    val df = corpus(1L -> "a", 2L -> "b", 3L -> "c")
    def dig(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Ingest.tableDigest(d, Seq.empty, Seq("id", "text")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val base = dig(df)
    assert(base._1 == 3L)
    assert(dig(df.repartition(7)) == base)
    assert(dig(df.orderBy(org.apache.spark.sql.functions.col("id").desc)) == base)
    // any single-row content change moves the digest
    assert(dig(corpus(1L -> "a", 2L -> "B", 3L -> "c")) != base)
    assert(dig(corpus(1L -> "a", 2L -> "b")) != base)
  }

  test("tableDigest groups: per-group digests match the whole-frame split") {
    import org.apache.spark.sql.functions.col
    val df = corpus(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
      .withColumn("g", col("id") % 2)
    val per = Ingest.tableDigest(df, Seq("g"), Seq("id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val odd = Ingest.tableDigest(df.filter(col("g") === 1), Seq.empty, Seq("id", "text"))
      .collect().head
    assert(per(1L) == ((odd.getLong(0), odd.getLong(1))))
    assert(per.keySet == Set(0L, 1L))
  }

  private def log(rows: (Long, Long, String)*) =
    spark.createDataFrame(rows).toDF("k", "ts", "status")

  private def history(rows: (Long, Long, String)*): Seq[(Long, String, Long, Any)] =
    Ingest.changeHistory(log(rows: _*), Seq("k"), "ts", Seq.empty, Seq("status"))
      .select("k", "status", "effective_from", "effective_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.get(3)))
      .sortBy(t => (t._1, t._3))

  test("changeHistory collapses runs and closes intervals at the next change") {
    val h = history(
      (1L, 10L, "new"), (1L, 20L, "new"), (1L, 30L, "active"), (1L, 40L, "closed"),
      (2L, 15L, "new"))
    assert(h == Seq(
      (1L, "new", 10L, 30L), // the ts=20 repeat is collapsed into this run
      (1L, "active", 30L, 40L),
      (1L, "closed", 40L, null),
      (2L, "new", 15L, null)))
  }

  test("changeHistory: attribute change to/from null opens a version (null-safe)") {
    val rows = Seq[(Long, Long, Option[String])](
      (1L, 10L, Some("a")), (1L, 20L, None), (1L, 30L, None), (1L, 40L, Some("a")))
    val df = spark.createDataFrame(rows).toDF("k", "ts", "status")
    val h = Ingest.changeHistory(df, Seq("k"), "ts", Seq.empty, Seq("status"))
      .select("effective_from").collect().map(_.getLong(0)).sorted
    assert(h.toSeq == Seq(10L, 20L, 40L))
  }

  test("changeHistory keeps tie columns for deterministic same-timestamp order") {
    val df = spark.createDataFrame(Seq(
        (1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 10L, 3L, "a")))
      .toDF("k", "ts", "eid", "status")
    val h = Ingest.changeHistory(df, Seq("k"), "ts", Seq("eid"), Seq("status"))
      .select("eid", "status").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(h.sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b"), (3L, "a")))
  }

  test("pointInTime: facts carry the version live at their timestamp; gaps/pre-history null") {
    // key 1: [10,20) "a", [20,40) "b", a GAP [40,50), then [50,∞) "c" —
    // the gap is the case a bare as-of backward join gets wrong
    val dim = spark.createDataFrame(Seq(
        (1L, 10L, Option(20L), "a"),
        (1L, 20L, Option(40L), "b"),
        (1L, 50L, Option.empty[Long], "c"),
        (2L, 5L, Option.empty[Long], "z")))
      .toDF("k", "effective_from", "effective_to", "status")
    val facts = spark.createDataFrame(Seq(
        (1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 45L), (1L, 50L),
        (1L, 99L), (2L, 7L), (3L, 7L)))
      .toDF("k", "t")
    val got = Ingest.pointInTime(facts, dim, "k", "t", Seq("status"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    assert(got == Set[(Long, Long, Any)](
      (1L, 5L, null),   // before the first version
      (1L, 10L, "a"),   // opening boundary is inclusive
      (1L, 19L, "a"),
      (1L, 20L, "b"),   // closing boundary excludes v1, opens v2
      (1L, 45L, null),  // inside the gap — the as-of carry is nulled
      (1L, 50L, "c"), (1L, 99L, "c"),
      (2L, 7L, "z"),
      (3L, 7L, null)))  // key the dim never saw
  }

  test("pointInTime equals the interval-containment join on a randomized history") {
    val rnd = new scala.util.Random(7)
    val logRows = (for { k <- 0L until 20L; _ <- 0 until 15 }
      yield (k, rnd.nextInt(1000).toLong, s"s${rnd.nextInt(4)}"))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, ts)
    val dim = Ingest.changeHistory(
      spark.createDataFrame(logRows).toDF("k", "ts", "status"),
      Seq("k"), "ts", Seq.empty, Seq("status"))
    val facts = spark.createDataFrame(
        (0 until 300).map(_ => (rnd.nextInt(22).toLong, rnd.nextInt(1100).toLong))
          .distinct)
      .toDF("k", "t")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), String.valueOf(r.get(2)))
    val got = Ingest.pointInTime(facts, dim, "k", "t", Seq("status"))
      .collect().map(key).sorted.toSeq
    val ref = facts.as("f").join(dim.as("d"),
        col("f.k") === col("d.k") && col("d.effective_from") <= col("f.t") &&
          (col("d.effective_to").isNull || col("f.t") < col("d.effective_to")),
        "left")
      .select(col("f.k"), col("f.t"), col("d.status"))
      .collect().map(key).sorted.toSeq
    assert(got == ref)
  }

  test("probablyNew: no false negatives; false positives bounded near fpp") {
    import spark.implicits._
    val corpus = (0L until 5000L).toDF("k")
    val batch = (4000L until 14000L).toDF("k") // 1000 seen + 9000 new
    val flagged = Ingest.probablyNew(corpus, batch, "k",
        expectedItems = 5000L, fpp = 0.01)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every corpus key must be flagged seen — bloom filters cannot miss
    assert((4000L until 5000L).forall(flagged(_)), "false negative!")
    // unseen keys: false-positive rate should be near fpp (generous 5x bound)
    val fp = (5000L until 14000L).count(flagged(_))
    assert(fp <= 9000 * 0.05, s"$fp false positives of 9000")
  }

  test("applyChanges: latest change wins, deletes remove, untouched keys pass through") {
    val base = spark.createDataFrame(Seq(
        (1L, "a"), (2L, "b"), (3L, "c")))
      .toDF("k", "v")
    // key 1: upsert@10 then delete@20 -> gone
    // key 2: delete@10 then upsert@20 -> new value wins
    // key 4: inserted; key 3 untouched
    val changes = spark.createDataFrame(Seq(
        (1L, "x", 10L, 1L, "upsert"), (1L, "y", 20L, 1L, "delete"),
        (2L, "z", 10L, 1L, "delete"), (2L, "B", 20L, 1L, "upsert"),
        (4L, "d", 10L, 1L, "upsert")))
      .toDF("k", "v", "ts", "tie", "op")
    val got = Ingest.applyChanges(base, changes, Seq("k"), "ts", "op", Seq("tie"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("madOutliers: hand-computed lower-median/MAD, robust flag, null passthrough") {
    // group g: values 1..9 plus a wild outlier 1000 and a null
    // lower median of {1..9, 1000} (n=10, rank 5) = 5
    // deviations {4,3,2,1,0,1,2,3,4,995} sorted -> rank 5 = 2 (MAD)
    val rows = ((1 to 9).map(v => ("g", Some(v.toDouble))) :+
      ("g", Some(1000.0)) :+ ("g", Option.empty[Double]))
    val got = Ingest.madOutliers(
      spark.createDataFrame(rows).toDF("k", "v"), Seq("k"), "v", k = 3.0)
    val byVal = got.collect().map { r =>
      val v = if (r.isNullAt(1)) null else r.getDouble(1)
      v -> (r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) null else r.getBoolean(4))
    }.toMap
    assert(byVal(5.0) == ((5.0, 2.0, false)))
    // |1000-5| = 995 > 3*2 -> flagged; |9-5| = 4 <= 6 -> not flagged
    assert(byVal(1000.0)._3 == true)
    assert(byVal(9.0)._3 == false)
    // null value: median/MAD still attached, flag stays null
    assert(byVal(null) == ((5.0, 2.0, null)))
    // the mean/stddev z-score would also have flagged 1000, but MAD keeps
    // the inliers unflagged even though the outlier inflates the stddev
    assert(byVal.collect { case (v, (_, _, f: java.lang.Boolean))
      if v != null && f.booleanValue() => v }.toSet == Set(1000.0))
  }

  test("psi: zero for identical snapshots, grows with shift, bins exhaustive") {
    import spark.implicits._
    val a = (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
    // identical distributions: every contribution is exactly 0
    val same = Ingest.psi(a, a, "v", 0.0, 100.0, 10)
      .agg(org.apache.spark.sql.functions.sum("contrib")).collect()(0).getDouble(0)
    assert(math.abs(same) < 1e-15)
    // shifted distribution: PSI clearly positive, and counts are exhaustive
    val b = (0 until 1000).map(i => (i % 100).toDouble + 40).toDF("v")
    val rows = Ingest.psi(a, b, "v", 0.0, 100.0, 10).collect()
    assert(rows.map(_.getLong(1)).sum == 1000 && rows.map(_.getLong(2)).sum == 1000)
    val psi = rows.map(_.getDouble(3)).sum
    assert(psi > 0.25, s"expected drift, psi=$psi")
    // overflow bin caught the shifted tail
    assert(rows.exists(r => r.getLong(0) == 10 && r.getLong(2) > 0))
    // nulls excluded, empty bins still contribute finitely
    val withNull = (Seq.fill(5)(Some(1.0)) :+ Option.empty[Double]).toDF("v")
    val nn = Ingest.psi(withNull, withNull, "v", 0.0, 100.0, 4).collect()
    assert(nn.map(_.getLong(1)).sum == 5)
    assert(nn.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("applyChanges: same-timestamp changes resolved by the tie column; replay converges") {
    val base = spark.createDataFrame(Seq((1L, "a"))).toDF("k", "v")
    val changes = spark.createDataFrame(Seq(
        (1L, "first", 10L, 1L, "upsert"), (1L, "second", 10L, 2L, "upsert")))
      .toDF("k", "v", "ts", "tie", "op")
    val once = Ingest.applyChanges(base, changes, Seq("k"), "ts", "op", Seq("tie"))
    assert(once.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "second")))
    // applying the same log to the already-applied table is a no-op
    val twice = Ingest.applyChanges(once, changes, Seq("k"), "ts", "op", Seq("tie"))
    assert(twice.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "second")))
  }
}
