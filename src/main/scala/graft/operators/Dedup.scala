package graft.operators

import graft.functions.{TextFunctions => TF, VectorOps => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text/embedding corpora.
  *
  * Five variants, all shuffle-conscious:
  *  - [[exact]]      — hash-groupBy on the dedup key (one shuffle).
  *  - [[minHashPairs]] — MinHash + banded LSH over word shingles, exact
  *    Jaccard verification of candidates. The LSH band join is an equi-join
  *    on (band, bandHash) so Spark shuffles only (docId, band) pairs — never
  *    the O(n²) cross product.
  *  - [[simHashPairs]] — 64-bit SimHash, block-LSH candidates, Hamming
  *    pre-filter (`bit_count(xor)`), exact Jaccard verification.
  *  - [[ngramJaccardPairs]] — exact shingle-Jaccard via an inverted-index
  *    self-join (only pairs sharing ≥1 shingle are ever materialized).
  *  - [[embeddingPairs]] — random-hyperplane (SRP) LSH over embeddings,
  *    exact cosine verification.
  *
  * Every candidate pair is verified against the exact similarity measure, so
  * the *output* is deterministic (equal to the brute-force answer) as long as
  * LSH recall holds; band/row counts are chosen so the miss probability at
  * the default thresholds is < 1e-6.
  */
object Dedup {

  /** Exact dedup: one surviving row key per distinct `dedupCols` group —
    * deterministic (keeps the minimum key), unlike `dropDuplicates`, which
    * keeps an arbitrary row. A single hash-aggregate shuffle on the dedup
    * key; at 100 TB this is the canonical map-side-combine pattern.
    */
  def exact(df: DataFrame, keyCol: String, dedupCols: Seq[String]): DataFrame =
    df.groupBy(dedupCols.map(col).toIndexedSeq: _*)
      .agg(min(col(keyCol)).as(keyCol), count(lit(1)).as("group_size"))

  /** Per-doc distinct shingle sets: (doc_id, shingles array). */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TF.shingleSet(col(textCol), n).as("sh"))

  /** MinHash signature matrix: (doc_id, sig array<bigint>[numHashes]).
    * Computed as `numHashes` column-wise mins over the exploded shingle
    * relation — Spark's partial aggregation keeps the shuffle at one row
    * per (doc, partition).
    */
  def minHashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, shingleN)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val hashes = TF.hashFamily(col("s"), numHashes)
    val mins = hashes.zipWithIndex.map { case (h, i) => min(h).as(s"h$i") }
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")).toIndexedSeq: _*).as("sig"))
  }

  /** LSH candidate pairs (i < j) from banding the signature matrix.
    * bands × rowsPerBand must equal numHashes.
    */
  def minHashCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minHashSignatures(docs, idCol, textCol, shingleN, numHashes)
    // One 64-bit hash per band over its slice of the signature.
    val bandHashes = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until r).map(i => element_at(col("sig"), b * r + i + 1)): _*)
    }
    val buckets = sig
      .select(col("doc_id"), posexplode(array(bandHashes: _*)).as(Seq("band", "bh")))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
  }

  /** Verify candidate (i, j) pairs with exact shingle Jaccard ≥ threshold. */
  def verifyJaccard(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int,
      candidates: DataFrame, threshold: Double): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, shingleN)
    candidates
      .join(sets.as("si"), col("i") === col("si.doc_id"))
      .join(sets.as("sj"), col("j") === col("sj.doc_id"))
      .select(col("i"), col("j"),
        TF.jaccard(col("si.sh"), col("sj.sh")).as("jac"))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), round(col("jac"), 3).as("jac"))
  }

  /** Near-duplicate pairs via MinHash LSH, exact-verified.
    * Defaults (128 hashes, 32 bands × 4 rows): P(miss | J=0.8) =
    * (1-0.8^4)^32 ≈ 5e-8 — the verified output equals brute force w.h.p.
    */
  def minHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame =
    verifyJaccard(docs, idCol, textCol, shingleN,
      minHashCandidates(docs, idCol, textCol, shingleN, numHashes, bands), threshold)

  /** 64-bit SimHash per document over word shingles: bit b of the hash is
    * the sign of the sum over shingles of ±1 according to bit b of the
    * shingle's xxhash64.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, shingleN)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), TF.hash64(col("s")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
    }
    val sums = sh.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-duplicate pairs via SimHash: block-LSH candidates (16 blocks × 4
    * bits ⇒ any pair with Hamming distance < 16 shares a block; near-dups at
    * J≥0.8 have expected Hamming ≈ 7), Hamming ≤ maxHamming pre-filter, then
    * exact Jaccard verification.
    */
  def simHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, blocks: Int = 16, maxHamming: Int = 20,
      threshold: Double = 0.8): DataFrame = {
    require(64 % blocks == 0, "blocks must divide 64")
    val w = 64 / blocks
    val sig = simHash(docs, idCol, textCol, shingleN)
    val blockVals = (0 until blocks).map { k =>
      shiftright(col("simhash"), k * w).bitwiseAND(lit((1L << w) - 1L))
    }
    val buckets = sig.select(col("doc_id"), col("simhash"),
      posexplode(array(blockVals: _*)).as(Seq("blk", "bv")))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxHamming)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    verifyJaccard(docs, idCol, textCol, shingleN, candidates, threshold)
  }

  /** Exact n-gram Jaccard pairs via inverted index: explode distinct
    * shingles, self-join on the shingle (only co-occurring pairs
    * materialize), count intersections, derive |union| from per-doc set
    * sizes. No LSH, no recall loss — the exact answer, at the cost of a
    * join whose size is Σ_shingle df(shingle)².
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, shingleN)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val co = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    co.join(sizes.as("ni"), col("i") === col("ni.doc_id"))
      .join(sizes.as("nj"), col("j") === col("nj.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("ni.n") + col("nj.n") - col("c"))).as("jac"))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), round(col("jac"), 3).as("jac"))
  }

  /** Near-duplicate embedding pairs (cosine ≥ threshold) via
    * random-hyperplane LSH: `tables` independent signature words of
    * `planesPerTable` bits each; candidates share a full word in ≥1 table;
    * exact cosine verification. Deterministic: hyperplanes are seeded.
    */
  def embeddingPairs(
      emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, planesPerTable: Int = 8, tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val sigCols = (0 until tables).map { t =>
      val planes = Array.fill(planesPerTable)(Array.fill(dim)(rnd.nextGaussian()))
      V.srpSignature(col(vecCol), planes.toIndexedSeq).as(s"sig$t")
    }
    val signed = emb.select(
      (col(idCol).as("vid") +: col(vecCol).as("v") +: sigCols).toIndexedSeq: _*)
    val buckets = signed.select(col("vid"), col("v"),
      posexplode(array((0 until tables).map(t => col(s"sig$t")): _*)).as(Seq("t", "sig")))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("i"), col("b.vid").as("j"),
        V.cosine(col("a.v"), col("b.v")).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 3).as("cos"))
  }
}
