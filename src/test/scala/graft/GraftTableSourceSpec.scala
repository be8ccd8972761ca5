package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.GraftTable
import org.apache.spark.sql.functions._

/** The SQL read path (`spark.read.format("graft-table")`): pushed
  * filters prune manifest files, projection reaches the parquet read,
  * results are exactly the transactional API's — and pruning is a HINT,
  * so untranslatable shapes (OR) stay row-exact at full scan cost rather
  * than wrongly pruning.
  */
class GraftTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def base(): String =
    Files.createTempDirectory("graft_sql_spec").toString + "/t"

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(k => (k, k * 2.0, s"u${k % 7}")).toDF("k", "v", "u")

  private def load(p: String) =
    spark.read.format("graft-table").option("path", p).load()

  test("SQL path == transactional read; pushed range filter prunes; projection prunes columns") {
    val p = base()
    val t = GraftTable.create(
      rows(0, 800).repartitionByRange(8, col("k")).sortWithinPartitions("k"),
      p, zoneCols = Seq("k"))
    val df = load(p)
    assert(df.schema.fieldNames.toSeq == Seq("k", "v", "u"))

    // full-scan equality with the transactional API
    assert(df.orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)

    // a narrow range filter must open fewer files than the manifest holds
    GraftTableRelation.clearScan(p)
    val got = df.filter(col("k") >= 650L && col("k") <= 720L)
      .select("k", "v").orderBy("k").collect().toSeq
    val want = t.read().filter(col("k") >= 650L && col("k") <= 720L)
      .select("k", "v").orderBy("k").collect().toSeq
    assert(got == want && got.size == 71)
    assert(GraftTableRelation.lastScan(p).exists {
      case (opened, total) => opened >= 1 && opened < total
    }, s"range pushdown must prune: ${GraftTableRelation.lastScan(p)}")

    // equality filter + single-column projection stays exact
    val one = df.filter(col("k") === 123L).select("u").collect()
    assert(one.map(_.getString(0)).toSeq == Seq(s"u${123 % 7}"))
  }

  test("OR filters prune per-disjunct and union survivors; IN lists probe per value; both exact") {
    val p = base()
    GraftTable.create(
      rows(0, 400).repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      p, zoneCols = Seq("k"))
    val df = load(p)
    // an OR across distant stripes prunes EACH arm and reads the union
    // of survivors: the two edge files open, the middle two never do —
    // and the result is exact either way (pruning is a hint)
    GraftTableRelation.clearScan(p)
    val got = df.filter(col("k") < 10L || col("k") >= 390L).count()
    assert(got == 20)
    assert(GraftTableRelation.lastScan(p).contains((2, 4)),
      s"OR must prune to the two edge stripes: " +
        s"${GraftTableRelation.lastScan(p)}")
    // an IN list expands to one Point disjunct per value
    GraftTableRelation.clearScan(p)
    assert(df.filter(col("k").isInCollection(Seq(5L, 395L))).count() == 2)
    assert(GraftTableRelation.lastScan(p).contains((2, 4)),
      s"IN must prune per value: ${GraftTableRelation.lastScan(p)}")
    // an OR with an arm pruning cannot check must NOT prune (the arm's
    // rows live anywhere) — but stays row-exact
    GraftTableRelation.clearScan(p)
    assert(df.filter(col("k") < 10L || col("u") === "u3").count() ==
      10 + (10L until 400L).count(_ % 7 == 3))
    assert(GraftTableRelation.lastScan(p).contains((4, 4)),
      s"an unprunable OR arm widens to a full scan: " +
        s"${GraftTableRelation.lastScan(p)}")
    assert(df.agg(sum("v")).head.getDouble(0) ==
      (0L until 400L).map(_ * 2.0).sum)
  }

  test("IS NULL / IS NOT NULL prune from the manifest's per-file null counts") {
    val p = base()
    // three files: two all-non-null range stripes + one all-null stripe
    val vals = (0L until 100L)
      .map(k => (java.lang.Long.valueOf(k), k * 2.0)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
    val nulls = (0 until 20)
      .map(i => (null.asInstanceOf[java.lang.Long], i * 1.0)).toDF("k", "v")
      .coalesce(1)
    GraftTable.create(vals.unionByName(nulls), p, zoneCols = Seq("k"))
    val df = load(p)
    // IS NULL opens only the stripe that counted nulls
    GraftTableRelation.clearScan(p)
    assert(df.filter(col("k").isNull).count() == 20)
    assert(GraftTableRelation.lastScan(p).contains((1, 3)),
      s"IS NULL must prune to the null-bearing stripe: " +
        s"${GraftTableRelation.lastScan(p)}")
    // IS NOT NULL prunes the all-null stripe away
    GraftTableRelation.clearScan(p)
    assert(df.filter(col("k").isNotNull).count() == 100)
    assert(GraftTableRelation.lastScan(p).contains((2, 3)),
      s"IS NOT NULL must prune the all-null stripe: " +
        s"${GraftTableRelation.lastScan(p)}")
    // and the free ride: a comparison's implied IsNotNull composes with
    // the range check; results stay exact under any pruning
    GraftTableRelation.clearScan(p)
    assert(df.filter(col("k") < 10L).count() == 10)
    assert(GraftTableRelation.lastScan(p).contains((1, 3)))
  }

  test("snapshot pinning and versionAsOf; missing path loud") {
    val p = base()
    val t = GraftTable.create(rows(0, 100), p, zoneCols = Seq("k"),
      nFiles = 2, keepVersions = 3)
    val df = load(p) // pins v1
    t.append(rows(100, 150))
    assert(df.count() == 100, "a later append must not shift a loaded frame")
    assert(load(p).count() == 150, "a fresh load sees the append")
    val asOf = spark.read.format("graft-table").option("path", p)
      .option("versionAsOf", "1").load()
    assert(asOf.count() == 100)

    val e = intercept[Exception] {
      spark.read.format("graft-table").load()
    }
    assert(e.getMessage.contains("path"), e.getMessage)

    // a pruned/never-committed version fails at load() with the
    // retention message, not a raw missing-path error mid-query
    val bad = intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("path", p)
        .option("versionAsOf", "99").load()
    }
    assert(bad.getMessage.contains("retained"), bad.getMessage)
  }

  test("a small graft dimension auto-broadcasts against a big fact (sizeInBytes wired)") {
    val p = base()
    GraftTable.create(rows(0, 1000), p, zoneCols = Seq("k"), nFiles = 1)
    val dim = load(p)
    val fact = spark.range(0, 200000L)
      .selectExpr("id % 1000 as k", "id as x")
    val plan = fact.join(dim, "k").queryExecution.executedPlan.toString
    // without sizeInBytes the relation reports defaultSizeInBytes
    // (≈ Long.Max) and this joins as a shuffle — the 100 TB pay-cut
    assert(plan.contains("BroadcastHashJoin"),
      s"a 1,000-row graft dim must auto-broadcast without a hint:\n$plan")
  }

  test("SQL write path: create-on-append, transactional append, modes, atomic replace") {
    val p = base()
    // first append CREATES (zoneCols option names the index)
    rows(0, 100).write.format("graft-table").option("path", p)
      .option("zoneCols", "k").mode("append").save()
    val t = GraftTable.open(spark, p)
    assert(t.version == 1 && t.read().count() == 100)
    // later appends are transactional table appends
    rows(100, 150).write.format("graft-table").option("path", p)
      .mode("append").save()
    assert(t.version == 2 && t.read().count() == 150)
    // ErrorIfExists refuses; Ignore no-ops (no version, no rows)
    intercept[Exception] {
      rows(0, 1).write.format("graft-table").option("path", p)
        .mode("errorifexists").save()
    }
    rows(0, 1).write.format("graft-table").option("path", p)
      .mode("ignore").save()
    assert(t.version == 2 && t.read().count() == 150)
    // Overwrite is ONE atomic replace commit: only the new rows remain,
    // stamped in the commit log
    rows(500, 520).write.format("graft-table").option("path", p)
      .mode("overwrite").save()
    assert(t.version == 3 && t.read().count() == 20)
    assert(t.history().orderBy("version").collect().last.getString(1)
      == "overwrite")
    // the replaced table still reads through the SQL path
    assert(load(p).orderBy("k").select("k").collect().map(_.getLong(0)).toSeq
      == (500L until 520L).toSeq)
    // creating WITHOUT an index spec is loud
    intercept[Exception] {
      rows(0, 1).write.format("graft-table").option("path", base())
        .mode("append").save()
    }
  }

  test("SQL append evolves schema additively; overwrite feeds delete+insert through the CDF") {
    val p = base()
    rows(0, 50).write.format("graft-table").option("path", p)
      .option("zoneCols", "k").option("keepVersions", "3")
      .mode("append").save()
    // an append with a NEW column evolves the schema like the API call
    rows(50, 80).withColumn("extra", col("k") * 10)
      .write.format("graft-table").option("path", p).mode("append").save()
    val t = GraftTable.open(spark, p)
    assert(t.read().schema.fieldNames.contains("extra"))
    assert(t.read().filter(col("extra").isNull).count() == 50,
      "pre-evolution rows read the new column as null")
    // overwrite's change slice is the full delete(old) + insert(new)
    rows(900, 910).write.format("graft-table").option("path", p)
      .mode("overwrite").save()
    val feed = t.readChanges(2, 3)
    assert(feed.filter(col("_change_type") === "delete").count() == 80)
    assert(feed.filter(col("_change_type") === "insert").count() == 10)
  }

  test("filters on non-indexed columns scan unpruned and exact, never crash") {
    val p = base()
    val t = GraftTable.create(
      rows(0, 400).repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      p, zoneCols = Seq("k"))
    val df = load(p)
    // Catalyst pushes EVERY comparison filter — a pushed filter on a
    // column the manifest does not index must fall back to the full
    // file list with the residual re-applied, not throw
    GraftTableRelation.clearScan(p)
    assert(df.filter(col("v") > 700.0).count() ==
      t.read().filter(col("v") > 700.0).count())
    assert(GraftTableRelation.lastScan(p).exists {
      case (opened, total) => opened == total
    }, s"non-indexed filter must not prune: ${GraftTableRelation.lastScan(p)}")
    assert(df.filter(col("u") === "u3").count() ==
      t.read().filter(col("u") === "u3").count())
    // mixed: the indexed half still prunes, the non-indexed half rides
    // as residual only
    GraftTableRelation.clearScan(p)
    val got = df.filter(col("k") < 100L && col("u") === "u3")
      .select("k").orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 100L).filter(k => k % 7 == 3))
    assert(GraftTableRelation.lastScan(p).exists {
      case (opened, total) => opened < total
    }, s"the indexed half of a mixed filter must still prune: " +
      s"${GraftTableRelation.lastScan(p)}")
  }
}
