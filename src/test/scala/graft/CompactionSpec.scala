package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction contract: row-for-row preservation, the file-count trigger
  * fires exactly when fragmentation exceeds the slack budget, and sorted
  * compaction restores the zone-map pruning an interleaved-append layout
  * lost.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fragmented(dir: String, n: Int = 2000, files: Int = 50): Unit =
    (0 until n).map(i => ((i * 7919) % n, i.toLong)).toDF("k", "id")
      .repartition(files) // hash-scatter: every file spans the full k range
      .write.parquet(dir)

  test("compactTo preserves rows exactly and hits the file budget") {
    val base = Files.createTempDirectory("compact").toString
    fragmented(s"$base/frag")
    val (before, _) = Compaction.stats(spark, s"$base/frag")
    assert(before >= 40, s"fixture must be fragmented: $before files")
    assert(Compaction.needsCompaction(spark, s"$base/frag", targetRows = 500))

    val (b, a, rows) = Compaction.compactTo(spark, s"$base/frag", s"$base/out",
      targetRows = 500, sortCols = Seq("k"))
    assert(b == before && rows == 2000 && a == 4,
      s"2000 rows at 500/file must land in 4 files, got $a")
    assert(!Compaction.needsCompaction(spark, s"$base/out", targetRows = 500))

    val got = spark.read.parquet(s"$base/out").orderBy("id")
      .as[(Int, Long)].collect().toSeq
    val want = spark.read.parquet(s"$base/frag").orderBy("id")
      .as[(Int, Long)].collect().toSeq
    assert(got == want, "compaction must be a pure relayout")
  }

  test("sorted compaction restores zone-map pruning that fragmentation destroyed") {
    val base = Files.createTempDirectory("compact2").toString
    fragmented(s"$base/frag")
    ZoneMap.build(spark, s"$base/frag", Seq("k"), s"$base/zm_frag")
    val band = Seq(ZoneMap.Range("k", 100, 199))
    val fragFiles = ZoneMap.prunedFiles(spark, s"$base/frag", s"$base/zm_frag", band).get
    assert(fragFiles.size >= 45,
      s"hash-scattered files all span the k range — nothing prunable: ${fragFiles.size}")

    Compaction.compactTo(spark, s"$base/frag", s"$base/sorted",
      targetRows = 250, sortCols = Seq("k"))
    ZoneMap.build(spark, s"$base/sorted", Seq("k"), s"$base/zm_sorted")
    val sortedFiles = ZoneMap.prunedFiles(spark, s"$base/sorted", s"$base/zm_sorted", band).get
    assert(sortedFiles.size <= 2,
      s"a 100-wide band of 2000 sorted rows at 250/file: ${sortedFiles.size}")

    val want = spark.read.parquet(s"$base/frag")
      .filter(col("k").between(100, 199)).agg(sum("id")).as[Long].head()
    assert(ZoneMap.scan(spark, s"$base/sorted", s"$base/zm_sorted", band)
      .agg(sum("id")).as[Long].head() == want)
  }

  test("byte-driven sizing compacts from listing metadata alone") {
    val base = Files.createTempDirectory("compact4").toString
    fragmented(s"$base/frag", n = 1000, files = 20)
    // 20 tiny files total a few hundred KB — a generous byte target must
    // fold them into one
    val (b, a) = Compaction.compactToBytes(spark, s"$base/frag", s"$base/out",
      targetBytes = 64L * 1024 * 1024)
    assert(b == 20 && a == 1)
    assert(spark.read.parquet(s"$base/out").count() == 1000)
  }

  test("unsorted compaction coalesces without losing rows") {
    val base = Files.createTempDirectory("compact3").toString
    fragmented(s"$base/frag", n = 1000, files = 20)
    val (_, a, rows) = Compaction.compactTo(spark, s"$base/frag", s"$base/out",
      targetRows = 500)
    assert(rows == 1000 && a <= 2)
    assert(spark.read.parquet(s"$base/out").count() == 1000)
  }
}
