package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry/oracle parity — pure-map checks that keep [[SparkEntry]] and
  * [[Oracles]] (split into separate files in round 7) from drifting: an
  * oracle keyed to a nonexistent query would silently never run in the
  * driver's correctness gate.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.toSeq.sorted}")
  }

  test("queries without an oracle are exactly the declared sketch/hash set") {
    // these ten are rows-only BY DESIGN (sketch-, recall- or
    // hash-specific output with no SQL-expressible oracle; ann_pq_index
    // and ann_ivfpq share ann_pq's measured necessity and are pinned
    // bit-identical to flat ADC by PqSpec/IvfPqSpec); anything new
    // appearing here means someone forgot to write an oracle
    val declared = Set("ann_lsh", "ann_pq", "ann_pq_index", "ann_ivfpq",
      "ann_ivfpq_res", // residual recipe: same no-ADC-oracle reality as
      // ann_ivfpq; recall-at-equal-bytes and meta round-trip spec-pinned
      "q_hll", "q_hll_merge", "stream_hll", "q_approx_quantile",
      "text_bpe", "text_unigram", "text_winnow",
      // recall-scoped by the published method (cluster-boundary pairs are
      // out of scope); SemanticDedupSpec pins clustered == exact on a
      // separable fixture, dedup_semantic is the oracle-exact k=1 form
      "dedup_semantic_clustered")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == declared,
      s"undeclared oracle-less queries: ${(noOracle -- declared).toSeq.sorted}; " +
        s"stale declarations: ${(declared -- noOracle).toSeq.sorted}")
  }

  test("UTC session invariant: the timezone the events NTZ->LTZ cast depends on") {
    // Tables.load normalizes events.ts with a cast that is only
    // instant-preserving under a UTC session; every entrypoint
    // (Session.local, Bench, Verify) pins it, and this pin fails the
    // build if a future entrypoint drops the config. Tables.load itself
    // also require()s it on the NTZ branch.
    val spark = graft.Session.local(4, "graft-test")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "the shared session must run UTC — oracle parity and the events " +
        "NTZ cast both depend on it")
  }

  test("registry size matches the shipped inventory") {
    assert(SparkEntry.queries.size == 235,
      s"query count drifted: ${SparkEntry.queries.size} (update this pin " +
        "AND SURVEY §2.4 when adding operators)")
  }
}
