package graft

import graft.operators.{AsOfJoin, ComponentsIndex, Dedup, DedupIndex, EmbedIndex, Graph, Indexing, Ingest, IvfPq, Multimodal, Packing, Pq, RangeJoin, Resample, Sampling, Similarity, TextAnalysis}
import graft.sources.Crawl
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Query bodies: dedup family, ANN family, multimodal.
  * Bodies are verbatim from the pre-split SparkEntry.scala — the
  * registry ([[SparkEntry.queries]]) is still the single source of truth
  * for which of these are wired to the driver.
  */
private[graft] object EntryDedup {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(t(s, d, "documents"), "doc_id", Seq("text"))
      .select(col("doc_id"), col("group_size").as("n"))
      .orderBy("doc_id")

  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    // 64 hashes / 16 bands of 4: P(miss | J=0.9) = (1-0.9^4)^16 ≈ 4e-8 —
    // verified output still equals brute force w.h.p. at half the hash cost
    Dedup.minHashPairs(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .orderBy("i", "j")

  /** Incremental ingest dedup: docs ≥ 400 arrive as the new batch and are
    * checked against the 0-399 corpus index — pairs touching ≥1 new doc.
    * Oracle: brute-force pairs restricted to j ≥ 400 (ids are ordered, so
    * j ≥ 400 ⟺ at least one member is new).
    */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Dedup.incrementalMinHashPairs(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .orderBy("i", "j")
  }

  /** The persistent-index form of [[dedupIncremental]] — same split, same
    * LSH geometry, same oracle: the corpus's band buckets and shingle
    * sets are materialized ONCE as bucketed parquet tables, then the
    * batch probes the stored index without re-hashing corpus text (the
    * shape whose per-batch cost stays flat as the corpus grows).
    */
  def dedupIndex(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = Scratch.dir("graft_mh_index")
    val idx = DedupIndex.build(docs.filter(col("doc_id") < 400),
      "doc_id", "text", path, "graft_q_mhidx",
      shingleN = 3, numHashes = 64, bands = 16, buckets = 8)
    idx.probe(docs.filter(col("doc_id") >= 400), "doc_id", "text", threshold = 0.8)
      .orderBy("i", "j")
  }

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    // 8-bit blocks (256 values/block) + Hamming <= 16: measured exact vs
    // brute force at sf0.01 AND sf0.1 (true-pair Hamming tail reaches 14)
    // at ~1/6 the candidate-join volume of the former 16x4-bit config
    Dedup.simHashPairs(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, blocks = 8, maxHamming = 16, threshold = 0.8)
      .orderBy("i", "j")

  def dedupNgram(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.8)
      .orderBy("i", "j")

  /** Cross-corpus contamination screen: the 0–399 corpus against the
    * ≥ 400 arriving batch through the exact R-S PPJoin
    * ([[Dedup.crossJaccardPairs]]) — the dedup_incremental split, but
    * EXACT (no LSH recall argument) and strictly cross-side: batch-batch
    * pairs are out of scope by definition, so the oracle is the
    * brute-force pair set restricted to one member per side.
    */
  def dedupCross(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Dedup.crossJaccardPairs(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "doc_id", "text", shingleN = 3, threshold = 0.8)
      .orderBy("i", "j")
  }

  /** The persistent form of [[dedupCross]]: benchmark side (≥ 400)
    * materialized once as the [[graft.operators.ScreenIndex]] (sets +
    * frozen-order prefixes + df ranks, all bucketed parquet), then the
    * corpus probes against parquet — same split, same oracle.
    */
  def dedupScreenIndex(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = Scratch.dir("graft_screen")
    val idx = graft.operators.ScreenIndex.build(
      docs.filter(col("doc_id") >= 400), "doc_id", "text",
      path, "graft_q_screen", shingleN = 3, threshold = 0.8, buckets = 8)
    idx.probe(docs.filter(col("doc_id") < 400), "doc_id", "text")
      .orderBy("i", "j")
  }

  /** The screen's maintenance cycle: build on half the benchmark, append
    * the rest past the frozen-order drift trip, rebuild (order re-derived
    * from STORED sets — no original text), probe — pairs cannot move
    * (the shared order is pruning, not semantics), so the cross oracle
    * applies to the full cycle, the dedup_embedding_rebuild pattern.
    */
  def dedupScreenRebuild(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val bench = docs.filter(col("doc_id") >= 400)
    val path = Scratch.dir("graft_screen_rb")
    val idx = graft.operators.ScreenIndex.build(
      bench.filter(col("doc_id") % 3 === 0), "doc_id", "text",
      s"$path/v1", "graft_q_screen_rb", shingleN = 3, threshold = 0.8,
      buckets = 8)
    idx.append(bench.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
    require(idx.needsRebuild(),
      "tripling the benchmark must trip the frozen-order rebuild")
    idx.rebuild(s"$path/v2")
      .probe(docs.filter(col("doc_id") < 400), "doc_id", "text")
      .orderBy("i", "j")
  }

  def dedupCorpus(s: SparkSession, d: String): DataFrame =
    Dedup.dedupeCorpus(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Quality-aware corpus dedup: survivors keep the LONGEST member of
    * each near-dup component (n_chars as the quality score, ties to the
    * smaller id) — the keep-the-best-copy policy, against the same
    * recursive-closure oracle as dedup_corpus with an argmax survivor
    * rule.
    */
  def dedupQuality(s: SparkSession, d: String): DataFrame =
    Dedup.dedupeCorpusBy(t(s, d, "documents"), "doc_id", "text", "n_chars")
      .orderBy("doc_id")

  def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.95)
      .select(col("i"), col("j"), col("cos").as("sim"))
      .orderBy("i", "j")

  /** SemDeDup-style semantic dedup in EXACT mode (`nClusters = 1` — the
    * within-cluster scope is the whole corpus, the ann_ivf nprobe=all
    * precedent), so survivors equal the brute-force cosine-closure the
    * oracle computes. The clustered scope cut the operator exists for is
    * [[dedupSemanticClustered]] + SemanticDedupSpec/ScaleProbe-pinned
    * (k-means assignment is not SQL-expressible).
    */
  def dedupSemantic(s: SparkSession, d: String): DataFrame =
    Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.45, nClusters = 1)
      .orderBy("vec_id")

  /** The REAL SemDeDup path: auto-derived k ([[Dedup.semanticK]] —
    * ⌈n/1024⌉, so sf0.01 runs exact and sf0.1 runs 5 genuine clusters),
    * rows-only by design: cluster-boundary pairs are out of scope
    * per the published method, so output is recall-scoped, not
    * SQL-reproducible. SemanticDedupSpec pins clustered == exact on a
    * separable fixture and candidate-volume linearity at two sizes.
    */
  def dedupSemanticClustered(s: SparkSession, d: String): DataFrame =
    Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.45)
      .orderBy("vec_id")

  /** Incremental connected components over near-dup pairs: the pair set
    * splits into two arrival waves, the index builds from wave 1 and
    * folds wave 2 in ([[ComponentsIndex]]), and the resolved labels must
    * equal the batch closure over ALL pairs — the oracle is the same
    * recursive-CTE reachability dedup_corpus uses, emitted as labels.
    */
  def dedupComponentsIndex(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select("i", "j").localCheckpoint(true)
    val path = Scratch.dir("graft_comp_index")
    val idx = ComponentsIndex.build(pairs.filter(col("j") < 250),
      path, "graft_q_cidx", buckets = 8)
    idx.update(pairs.filter(col("j") >= 250))
    idx.assignments().orderBy("doc_id")
  }

  /** The retraction workflow [[CompIndex.rebuildFrom]] closes: build the
    * incremental index over ALL near-dup pairs, retract the smallest doc
    * appearing in any pair (its pairs vanish — deletion can SPLIT a
    * component, which the incremental path cannot express), and rebuild
    * from the survivors. Labels must equal the batch closure over the
    * surviving pair set — the oracle recomputes exactly that with the
    * same min-doc retraction in SQL.
    */
  def dedupComponentsRebuild(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select("i", "j").localCheckpoint(true)
    val path = Scratch.dir("graft_comp_rb")
    val idx = ComponentsIndex.build(pairs, path, "graft_q_crb", buckets = 8)
    val retract = pairs.agg(min(col("i"))).head.getLong(0)
    val rebuilt = idx.rebuildFrom(
      pairs.filter(col("i") =!= retract && col("j") =!= retract), s"$path-v2")
    rebuilt.assignments().orderBy("doc_id")
  }

  /** The [[SrpEmbedIndex.rebuild]] maintenance cycle end-to-end: build on
    * HALF the corpus at a toy targetBucket (so fixture-scale growth
    * crosses the frozen-key-width wall), append the other half until
    * [[SrpEmbedIndex.needsRebuild]] trips, rebuild at the re-derived
    * geometry, then probe ten planted clones. Clones are bit-identical
    * vectors (recall exactly 1 at ANY geometry), so the result is the
    * same closed-form pair set as [[dedupEmbeddingIndex]] — which is what
    * makes the rebuild oracle-checkable: geometry changes, answers don't.
    */
  def dedupEmbeddingRebuild(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val path = Scratch.dir("graft_emb_rb")
    val idx = EmbedIndex.build(emb.filter(col("vec_id") < 250),
      "vec_id", "embedding", path, "graft_q_erb",
      dim = 64, threshold = 0.95, buckets = 8, targetBucket = 1)
    idx.append(emb.filter(col("vec_id") >= 250), "vec_id", "embedding")
    require(idx.needsRebuild(targetBucket = 1),
      "the doubled corpus must trip the frozen-width check")
    val rebuilt = idx.rebuild(s"$path-v2", targetBucket = 1)
    val batch = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    rebuilt.probe(batch, "vec_id", "embedding", threshold = 0.95)
      .select(col("i"), col("j"), col("cos").as("sim"))
      .orderBy("i", "j")
  }

  /** The streaming form of [[dedupComponentsIndex]]: the same pair set
    * arrives as a THREE-wave file stream driven through
    * [[CompIndex.updateStream]], and the resolved labels must equal the
    * batch closure — same oracle, because arrival-form invariance is the
    * operator's contract (merges commute).
    */
  def streamComponents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select("i", "j").localCheckpoint(true)
    val base = Scratch.dir("graft_comp_stream")
    Seq(col("j") < 150, col("j") >= 150 && col("j") < 300, col("j") >= 300)
      .foreach { p =>
        pairs.filter(p).coalesce(1).write.mode("append").parquet(s"$base/in")
      }
    val idx = ComponentsIndex.build(
      s.range(0).selectExpr("id AS i", "id AS j"),
      s"$base/cidx", "graft_q_scomp", buckets = 8)
    idx.updateStream(
      s.readStream
        .schema(StructType(Seq(
          StructField("i", LongType), StructField("j", LongType))))
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      Scratch.ckptDir("sdcomp_ck"))
    idx.assignments().orderBy("doc_id")
  }

  /** The persistent-index form of [[dedupEmbedding]]: the corpus's SRP
    * bucket keys and vectors are materialized once as bucketed tables
    * ([[EmbedIndex.build]]), then a batch of ten clones of vectors 0..9
    * (ids +10000 — guaranteed cos-1.0 near-dups with bit-identical keys,
    * so LSH recall is exactly 1 and the oracle is closed-form) probes the
    * stored index without re-keying corpus vectors. Oracle: brute-force
    * cosine pairs over corpus ∪ batch restricted to pairs touching the
    * batch (batch ids sort last, so `j ≥ 10000` ⟺ touching).
    */
  def dedupEmbeddingIndex(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val path = Scratch.dir("graft_emb_index")
    val idx = EmbedIndex.build(emb, "vec_id", "embedding", path,
      "graft_q_eidx", dim = 64, threshold = 0.95, buckets = 8)
    val batch = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    idx.probe(batch, "vec_id", "embedding", threshold = 0.95)
      .select(col("i"), col("j"), col("cos").as("sim"))
      .orderBy("i", "j")
  }

  def annTopk(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")

  def annLsh(s: SparkSession, d: String): DataFrame =
    Similarity.srpTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        Seq(0L, 1L, 2L, 3L, 4L), 3, dim = 64)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")

  /** IVF with nprobe = nClusters is exhaustive ⇒ exact — shares the
    * brute-force oracle while exercising the index path end-to-end.
    */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val idx = Similarity.IvfIndex.build(s, emb, "vec_id", "embedding", nClusters = 16)
    // DataFrame query side: no driver materialization of the query vectors
    idx.search(emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")
  }

  /** The persisted form of [[annIvf]]: the index is saved as centroids
    * parquet + cluster-bucketed assignments, re-opened cold, and searched
    * through the bucket-pruned literal-IN path (nprobe = all clusters, so
    * the result equals exact search and shares `ann_topk`'s oracle).
    */
  def annIvfIndex(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val idx = Similarity.IvfIndex.build(s, emb, "vec_id", "embedding", nClusters = 16)
    val path = Scratch.dir("graft_ivf_index")
    Similarity.IvfIndex.save(idx, "graft_q_ivfidx", path)
    val reopened = Similarity.IvfIndex.open(s, "graft_q_ivfidx", path)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    reopened.search(queries, k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")
  }

  /** The drift-maintenance cycle of the IVF index as ONE oracle-checked
    * query — the vector-quantization twin of [[dedupEmbeddingRebuild]]:
    * build+save on the fixture corpus, append a deterministic far-away
    * cluster (ids +10000, values 25.0 + (id%7)·0.3 + dim·0.01 — a
    * distribution shift the frozen quantizer has never seen, closed-form
    * so the oracle can recreate it), REQUIRE the observed-drift check to
    * trip, retrain from the STORED vectors, search at nprobe = nClusters.
    * Full probing is exhaustive, so the whole cycle is SQL-checkable:
    * whatever centroids the retrain produced, search == brute-force
    * cosine top-k over corpus ∪ cluster.
    */
  def annIvfRetrain(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val path = Scratch.dir("graft_ivf_rt")
    val idx = Similarity.IvfIndex.build(s, emb, "vec_id", "embedding", nClusters = 16)
    Similarity.IvfIndex.save(idx, "graft_q_ivfrt", s"$path/v1")
    val opened = Similarity.IvfIndex.open(s, "graft_q_ivfrt", s"$path/v1")
    val shifted = s.range(10000L, 10500L)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => lit(25.0) + (col("id") % 7).cast("double") * 0.3 +
            i.cast("double") * 0.01).as("embedding"))
    opened.append(shifted, "vec_id", "embedding")
    require(opened.needsRetrain(),
      "a corpus half made of a far-away cluster must trip the drift check")
    val retrained = opened.retrain(s"$path/v2")
    require(!retrained.needsRetrain(),
      "a just-retrained index must not want another retrain")
    val all = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(shifted)
    val queries = all.filter(col("vec_id").isin(0L, 1L, 2L, 10000L, 10001L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    retrained.search(queries, k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("cos").as("sim"))
      .orderBy("query_id", "rnk")
  }

  /** Product-quantized ADC search: codebooks trained on the corpus (seeded,
    * deterministic), every vector compressed to 8 one-byte codes, queries
    * ranked by asymmetric distance. Rows-only BY MEASURED NECESSITY, not
    * convenience: an IVF-style tolerance oracle (ADC rank == exact L2
    * rank at a fine-enough codebook) was probed and does not exist on
    * this fixture — its embeddings are near-uniform on the sphere (every
    * inter-rank exact-distance gap is 0.5–2 % of the distance itself),
    * and even a near-degenerate dsub=2 / k=256 codebook (32× finer than
    * the production shape) still reorders ranks on 4 of 10 query legs
    * across sf0.01/sf0.1. PqSpec certifies the real contract instead:
    * determinism, feasibility, and recall on separated clusters.
    */
  def annPq(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16)
    Pq.adcTopK(emb, "vec_id", "embedding", cb, Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"), col("adist"))
      .orderBy("query_id", "rnk")
  }

  /** The stored-codes face of [[annPq]]: codebook + encoded corpus
    * persisted once ([[Pq.saveIndex]] — the corpus rests at m bytes per
    * vector, 32× smaller than float32), cold reopen, ADC search scanning
    * the codes TABLE. Rows-only for the same measured reason as ann_pq
    * (no ADC-rank tolerance oracle exists on this fixture — see the annPq
    * scaladoc); the real contract is PqSpec's bit-identical parity between
    * stored-codes search and the in-memory ADC path through the full
    * append/delete/compact cycle.
    */
  def annPqIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = t(s, d, "embeddings")
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16)
    val path = Scratch.dir("graft_pq_index")
    Pq.saveIndex(emb, "vec_id", "embedding", cb, "graft_q_pqidx", path)
    val idx = Pq.openIndex(s, "graft_q_pqidx", path)
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])].collect().toMap
    idx.search(qs, k = 3)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("adist"))
      .orderBy("query_id", "rnk")
  }

  /** The composite IVF-PQ index cold-reopened and searched at full
    * probing: coarse-pruned buckets + ADC over stored codes — the
    * production 100 TB layout (32× compression × nprobe/nClusters read).
    * Rows-only for the ann_pq family's measured reason; IvfPqSpec pins
    * full-probe search bit-identical to flat ADC and bucket pruning at
    * nprobe=1.
    */
  def annIvfPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = t(s, d, "embeddings")
    val path = Scratch.dir("graft_ivfpq")
    IvfPq.build(emb, "vec_id", "embedding", "graft_q_ivfpq", path,
      nClusters = 16, m = 8, kCodes = 16)
    val idx = IvfPq.open(s, "graft_q_ivfpq", path)
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])].collect().toMap
    idx.search(qs, k = 3, nprobe = 16)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("adist"))
      .orderBy("query_id", "rnk")
  }

  /** Residual-coded IVF-PQ — [[IvfPq]] with `residual = true`, the
    * published FAISS IVFPQ recipe: the codebook quantizes v −
    * centroid(cluster), so PQ cells cover intra-cluster spread instead
    * of the corpus diameter — materially better recall at the SAME
    * m bytes/vector. Rows-only like ann_ivfpq (ADC rankings are
    * quantizer-implementation-defined, so no engine-independent SQL
    * oracle exists); the claims are spec-pinned instead: IvfPqSpec's
    * planted-twins fixture measures recall@1 ≥ the raw variant at equal
    * bytes, and the reopened index (variant flag from meta) searches
    * bit-identically to the in-memory handle.
    */
  def annIvfPqRes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = t(s, d, "embeddings")
    val path = Scratch.dir("graft_ivfpqr")
    IvfPq.build(emb, "vec_id", "embedding", "graft_q_ivfpqr", path,
      nClusters = 16, m = 8, kCodes = 16, residual = true)
    val idx = IvfPq.open(s, "graft_q_ivfpqr", path)
    require(idx.residual, "the variant flag must round-trip through meta")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])].collect().toMap
    idx.search(qs, k = 3, nprobe = 4)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        col("adist"))
      .orderBy("query_id", "rnk")
  }

  /** 36×32 synthetic RGB image for ordinal `j`: groups of three variants
    * per seed — base, uniformly brightness-shifted (+40 on every
    * channel; base values stay < 200, so no clamping and dHash is
    * exactly invariant), and a locally edited copy (+50 red across the
    * top-left 4×4 cell, which can flip at most the one comparison that
    * cell participates in). Pure integer arithmetic, so a SQL engine
    * can replay pixel → luma → cell → hash bit-exactly.
    */
  private def synthPpm(j: Long): Array[Byte] = {
    val (w, h) = (36, 32)
    val seed = j / 3
    val variant = j % 3
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = (seed * 7919L + x * 31L + y * 17L) % 200
        var g = (seed * 104729L + x * 13L + y * 29L) % 200
        var b = (seed * 1299709L + x * 37L + y * 11L) % 200
        if (variant == 1) { r += 40; g += 40; b += 40 }
        if (variant == 2 && x < 4 && y < 4) r += 50
        val o = (y * w + x) * 3
        rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    Multimodal.Codecs.encodePpm(w, h, rgb)
  }

  /** Image near-dup dedup over REAL payload bytes: 48 synthetic PPMs
    * (16 groups of original / brightness-shifted / locally-edited
    * copies) round-trip the actual P6 encoder and decoder
    * ([[Multimodal.Codecs]]), pool to the integer dHash, and the banded
    * self-join + exact Hamming verify recovers the planted near-dup
    * pairs. Recall is exact (Hamming ≤ 3 over 4 bands — pigeonhole), so
    * the oracle is the same integer pixel → luma grid → hash → Hamming
    * arithmetic spelled as brute-force SQL: a hash match certifies the
    * whole decode→hash path, the q_zorder_key precedent for generated
    * bit-exact oracles.
    */
  def mmDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy("doc_id")
    val ids = t(s, d, "documents").select("doc_id").orderBy("doc_id").limit(48)
      .withColumn("j", row_number().over(w).cast("long") - 1)
      .as[(Long, Long)]
    val items = ids.map { case (docId, j) =>
      Multimodal.MediaItem(docId, synthPpm(j), "ppm") }
    val pairs = Multimodal.nearDupPairs(
      Multimodal.dhash(items).toDF(), maxHamming = 3)
    pairs.select(col("id_a").as("a"), col("id_b").as("b"), col("hamming"))
      .orderBy("a", "b")
  }

  /** Deterministic 16-bit PCM WAV for ordinal `j`: groups of FOUR
    * variants per seed — a base square-wave clip whose per-window
    * amplitude envelope A_w = (seed·7919 + w·104729 + seed·w·337)
    * % 6000 + 2000 IS the fingerprint content (65 windows × 64 mono
    * frames at 8 kHz; the seed-dependent step keeps seeds' envelopes
    * decorrelated);
    * a PITCH-shifted copy (half the square-wave period — every sample
    * differs, every |sample| and hence every window energy is
    * identical); a VOLUME-shifted copy (amplitudes ×2 — energies scale
    * uniformly ×4, comparisons invariant); and a locally edited copy
    * (window 0's amplitude +3000, which can flip only the one
    * comparison that window joins). Pure integer arithmetic with exact
    * 64-frame windows, so a SQL engine replays amplitude → energy →
    * comparison → hash bit-exactly.
    */
  private def synthWav(j: Long): Array[Byte] = {
    val seed = j / 4
    val variant = j % 4
    val half = if (variant == 1) 2 else 4 // pitch shift: shorter period
    val samples = new Array[Short](65 * 64)
    var i = 0
    while (i < samples.length) {
      val w = i / 64
      // the seed-dependent w-step decorrelates envelopes ACROSS seeds
      // (a fixed step walks one orbit phase-shifted, and close phases
      // made unplanted cross-seed pairs collide within Hamming 3)
      var a = (seed * 7919L + w * 104729L + seed * w * 337L) % 6000L + 2000L
      if (variant == 3 && w == 0) a += 3000L
      if (variant == 2) a *= 2L
      val v = if ((i / half) % 2 == 0) a else -a
      samples(i) = v.toShort
      i += 1
    }
    Multimodal.Codecs.encodeWav(8000, 1, samples)
  }

  /** Audio near-dup dedup over REAL payload bytes — the [[mmDedup]]
    * shape for the remaining modality: 48 synthetic WAVs (12 groups of
    * original / pitch-shifted / volume-shifted / locally-edited clips)
    * round-trip the actual RIFF encoder and decoder
    * ([[Multimodal.Codecs]]), pool to the integer banded energy
    * fingerprint, and the banded self-join + exact Hamming verify
    * recovers the planted near-dup pairs. Recall is exact (Hamming ≤ 3
    * over 4 bands — pigeonhole), so the oracle is the same integer
    * amplitude → energy → comparison → Hamming arithmetic spelled as
    * brute-force SQL; 16-bit PCM encode∘decode is the identity on
    * samples, so the decode round-trip drops out of the arithmetic.
    */
  def mmAudioDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy("doc_id")
    val ids = t(s, d, "documents").select("doc_id").orderBy("doc_id").limit(48)
      .withColumn("j", row_number().over(w).cast("long") - 1)
      .as[(Long, Long)]
    val items = ids.map { case (docId, j) =>
      Multimodal.MediaItem(docId, synthWav(j), "wav") }
    val pairs = Multimodal.nearDupPairs(
      Multimodal.audioHash(items).toDF(), maxHamming = 3)
    pairs.select(col("id_a").as("a"), col("id_b").as("b"), col("hamming"))
      .orderBy("a", "b")
  }

  def mmFeatures(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "text/plain"))
    feats.toDF()
      .select(col("id").as("doc_id"), col("n_bytes"))
      .join(docs.select(col("doc_id"),
        md5(col("text").cast("binary")).as("digest")), Seq("doc_id"))
      .orderBy("doc_id")
  }
}
