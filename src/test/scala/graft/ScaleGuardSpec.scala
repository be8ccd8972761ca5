package graft

import graft.operators.{Dedup, Lsh}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CI-gated scale guard: the two dataflow pathologies the 505k-row
  * ScaleProbe caught in round 5 — quadratic LSH candidate volume from a
  * fixed-width key, and band joins degenerating past planted-duplicate
  * volume — asserted here on scaled-down corpora (tens of thousands of
  * rows) via CANDIDATE COUNTS, not wall time, so a reintroduced
  * pathology fails `sbt test` instead of a 100 TB run. ScaleProbe
  * remains the full-size ad-hoc evidence; this is the regression tripwire.
  */
class ScaleGuardSpec extends SparkSpec {

  /** Deterministic pseudo-random unit-ish vectors (same construction as
    * ScaleProbe's embedding leg).
    */
  private def vecs(n: Long, dim: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(col("id"), j), lit(2000L)) - 1000L)
          .cast("double") / 1000.0).cast("float")).as("embedding"))

  /** Token-salad corpus with `planted` appended exact duplicates. */
  private def saladDocs(n: Long, planted: Long): DataFrame = {
    val toks = (0 until 20).map(j =>
      substring(md5(concat(col("id").cast("string"), lit(s":$j"))), 1, 8))
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", toks: _*).as("text"))
    val dups = base.filter(col("doc_id") < planted)
      .select((col("doc_id") + n).as("doc_id"), col("text"))
    base.unionAll(dups)
  }

  test("auto SRP geometry keeps embedding candidate volume LINEAR in corpus size") {
    // 16k -> 64k rows straddles the width derivation (9 -> 11 bits), so
    // expected bucket occupancy is ~constant and candidates scale ~4x.
    // Re-pinning a fixed key width (the reverted default this guards
    // against) holds bucket COUNT constant instead, occupancy grows 4x,
    // and the ratio lands ~16x — tripping the 8x gate.
    def candidates(n: Long): Long = {
      val c = Dedup.embeddingCandidates(
        vecs(n, 16), "vec_id", "embedding", dim = 16, threshold = 0.999).count()
      Dedup.releaseCaches()
      c
    }
    val c16 = candidates(16000L)
    val c64 = candidates(64000L)
    assert(c16 > 0, "guard fixture produced no candidates at 16k — not probing anything")
    // The RATIO is the gate: linear scaling lands ~4x (occupancy held
    // constant by the width derivation; low-dim bucket clumping affects
    // both sizes equally), fixed-width reversion lands ~16x (quadratic).
    // No absolute bound — clumping of 16-dim vectors inflates absolute
    // counts by a scale-free constant that says nothing about the shape.
    assert(c64 <= 8 * c16,
      s"embedding candidate volume super-linear: 16k -> $c16, 64k -> $c64 " +
        "(auto key-width derivation broken or reverted to a fixed width)")
  }

  test("minhash band-bucket candidates stay planted-proportional at 50k docs") {
    // 50k distinct token salads + 500 planted exact dups: band collisions
    // must be EXACTLY the planted pairs (a random 4-minhash band bucket
    // collision is ~2^-64-rare) — any drift here is the signature or
    // band fold going degenerate, the shape that becomes all-pairs at
    // 100 TB. Same invariant ScaleProbe asserts at 505k.
    val docs = saladDocs(50000L, 500L)
    val cands = Dedup.minHashCandidates(docs, "doc_id", "text").count()
    assert(cands == 500L, s"minhash candidates $cands != 500 planted pairs")
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text").count()
    assert(pairs == 500L, s"minhash verified pairs $pairs != 500 planted pairs")
    Dedup.releaseCaches()
  }

  test("Lsh.autoPlanes / autoTables encode the documented scaling rules") {
    // occupancy rule: n / 2^bits stays ~targetBucket once past the floor
    assert(Lsh.autoPlanes(500L) == 8)          // fixture-sized: the floor
    assert(Lsh.autoPlanes(16000L) == 9)
    assert(Lsh.autoPlanes(64000L) == 11)
    assert(Lsh.autoPlanes(505000L) == 14)
    assert(Lsh.autoPlanes(50000000L) == 21)
    assert(Lsh.autoPlanes(Long.MaxValue) == 24) // capped
    // recall rule: P(miss) <= 1e-3 at the threshold; monotone in bits
    val t8 = Lsh.autoTables(8, 0.95)
    val t14 = Lsh.autoTables(14, 0.95)
    assert(t8 >= 1 && t14 >= t8, s"tables not monotone in bits: $t8, $t14")
    val p = 1.0 - math.acos(0.95) / math.Pi
    val miss = math.pow(1.0 - math.pow(p, 14), t14.toDouble)
    assert(miss <= 1e-3, s"derived table count misses too often: $miss")
    // exact duplicates need one table regardless of width
    assert(Lsh.autoTables(24, 1.0) == 1)
  }
}
