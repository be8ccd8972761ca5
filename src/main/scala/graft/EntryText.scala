package graft

import graft.operators.{AsOfJoin, Dedup, DedupIndex, Dsir, Graph, Indexing, Ingest, Multimodal, Packing, Pq, QualityModel, RangeJoin, Resample, Sampling, Similarity, TextAnalysis}
import graft.sources.Crawl
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Query bodies: text-analysis family.
  * Bodies are verbatim from the pre-split SparkEntry.scala — the
  * registry ([[SparkEntry.queries]]) is still the single source of truth
  * for which of these are wired to the driver.
  */
private[graft] object EntryText {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def textLangid(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  def textQuality(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id") +: TextAnalysis.qualityColumns(col("text")): _*)
      .orderBy("doc_id")

  def textTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id") +: TextAnalysis.tokenCountColumns(col("text")): _*)
      .orderBy("doc_id")

  def textFingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Winnowing sketch — hash-function-specific, so rows-only check. The
    * sketch is reduced to scalar columns (size + digest): the driver's
    * rows-only check sorts result values, which a raw array column breaks;
    * exploding instead would re-evaluate the kernel per output row
    * (projections collapse into generators). xxhash64 over an array is
    * order-SENSITIVE, so the digest is taken over array_sort(sketch) —
    * stable regardless of the kernel's emission order (Winnow happens to
    * emit sorted distinct minima today, but the digest must not depend on
    * that coupling).
    */
  def textWinnow(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.winnow(col("text")).as("sketch"))
      .select(col("doc_id"), size(col("sketch")).as("n"),
        xxhash64(array_sort(col("sketch"))).as("digest"))
      .orderBy("doc_id")

  /** Benchmark decontamination over the documents table: docs sharing an
    * 8-token shingle with the pseudo-holdout (doc_id % 10 = 5), with the
    * count of distinct contaminating shingles.
    */
  def textDecontaminate(s: SparkSession, d: String): DataFrame =
    TextAnalysis.contamination(t(s, d, "documents"), "doc_id", "text",
        col("doc_id") % 10 === 5, n = 8)
      .orderBy("doc_id")

  /** Windowed co-occurrence counts (forward window 3, min count 50):
    * top-30 ordered token pairs — the GloVe-matrix shape. Counts are
    * integers and ties break on (x, y), so the limit cut is exact.
    */
  def textCooc(s: SparkSession, d: String): DataFrame =
    TextAnalysis.cooccurrence(t(s, d, "documents"), "text", window = 3, minCount = 50)
      .orderBy(col("c").desc, col("x"), col("y"))
      .limit(30)

  /** Sliding-window chunking (len 8, stride 6) of every document,
    * digested per chunk so the compare pins exact chunk boundaries and
    * content without shipping token arrays.
    */
  def textChunks(s: SparkSession, d: String): DataFrame =
    Packing.slidingChunks(t(s, d, "documents"), "doc_id", "text", chunkLen = 8, stride = 6)
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("digest"))
      .orderBy("doc_id", "chunk_id")

  /** Line-level (C4/Dolma paragraph) dedup over a lined view of the
    * corpus: each document re-laid-out as newline-separated 10-token
    * lines (the fixture corpus has no natural line breaks), then every
    * repeated line keeps only its globally first (doc, position)
    * occurrence. Per-doc kept/removed counts plus the md5 of the
    * reassembled text pin the exact surviving line set and order.
    */
  def textLineDedup(s: SparkSession, d: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val n = greatest(ceil(size(toks).cast("double") / 10.0), lit(1L))
    val lined = t(s, d, "documents").select(col("doc_id"),
      array_join(transform(sequence(lit(1L), n),
        i => array_join(slice(toks, ((i - lit(1L)) * 10 + 1).cast("int"),
          lit(10)), " ")), "\n").as("text"))
    Dedup.lineDedup(lined, "doc_id", "text")
      .select(col("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("digest"))
      .orderBy("doc_id")
  }

  /** PMI bigram collocations over the documents corpus: top-20 adjacent
    * pairs most over-represented vs their unigram frequencies (min count
    * 5). Ordering uses the ROUNDED pmi so a last-ulp ln() difference
    * between engines cannot flip the limit cut.
    */
  def textPmi(s: SparkSession, d: String): DataFrame =
    TextAnalysis.pmiBigrams(t(s, d, "documents"), "text", minCount = 5)
      .select(col("x"), col("y"), col("cxy"), round(col("pmi"), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("x"), col("y"))
      .limit(20)

  /** Per-document lexical diversity: token/type counts, type-token ratio,
    * token-distribution Shannon entropy (nats) — the template-page /
    * keyword-stuffing quality gate.
    */
  def textDiversity(s: SparkSession, d: String): DataFrame =
    TextAnalysis.lexicalDiversity(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("ttr"), 6).as("ttr"), round(col("entropy"), 6).as("entropy"))
      .orderBy("doc_id")

  /** Span-level decontamination over the documents table: for every doc
    * sharing an 8-gram with the pseudo-holdout, the covered tokens are
    * excised and the remainder digested (md5 keeps the compare exact
    * without dumping full texts).
    */
  def textDespan(s: SparkSession, d: String): DataFrame =
    TextAnalysis.removeContaminatedSpans(t(s, d, "documents"), "doc_id", "text",
        col("doc_id") % 10 === 5, n = 8)
      .select(col("doc_id"), col("n_removed"), md5(col("clean_text")).as("clean_digest"))
      .orderBy("doc_id")

  /** Corpus self-dedup of cross-document repeated 8-grams (keep-first):
    * the Lee et al. ExactSubstr shape with no holdout — every span
    * appearing in >1 document survives only in its min-doc_id owner.
    */
  def textSelfDedup(s: SparkSession, d: String): DataFrame =
    TextAnalysis.removeRepeatedSpans(t(s, d, "documents"), "doc_id", "text", k = 8)
      .select(col("doc_id"), col("n_removed"), md5(col("clean_text")).as("clean_digest"))
      .orderBy("doc_id")

  /** Repetition metrics per document (the MassiveText/Gopher-style filter
    * signals): duplicate 3-gram fraction (narrow, per-row arrays) and
    * top-token concentration (two hash-aggs). Ratios round to 6 digits —
    * small-integer ratios k/n can terminate with a '5' exactly at digit 4,
    * where Spark's decimal-string rounding and the oracle's binary
    * rounding disagree; at digit 7 that needs a 5^7 denominator, which
    * token counts cannot reach.
    */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    // Materialize token and shingle arrays ONCE through a cache: both are
    // lambda-bearing expressions (excluded from subexpression elimination),
    // so referencing them from collapsed projections or generators would
    // re-evaluate the whole array per reference / per output row.
    val arr = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"),
        graft.functions.TextFunctions.shingles(col("text"), 3).as("g"))
      .cache()
    val top = arr.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("maxc"), sum(col("c")).as("n"))
      .select(col("doc_id"),
        round(col("maxc").cast("double") / col("n"), 6).as("top_token_frac"))
    val dup = arr.select(col("doc_id"),
      round(when(size(col("g")) === 0, 0.0)
        .otherwise(lit(1.0) -
          size(array_distinct(col("g"))).cast("double") / size(col("g"))), 6)
        .as("dup_3gram_frac"))
    dup.join(top, Seq("doc_id")).orderBy("doc_id")
  }

  /** Model-based quality filter, END-TO-END: label every document by a
    * planted SQL-expressible rule (contains the token `spark`), train
    * the hashed-bag-of-words logistic classifier on those labels, score
    * the same corpus, and emit the hard predictions. The oracle IS the
    * rule — the query only hash-matches if the model actually LEARNED
    * the planted signal to 100 % training accuracy (deterministic:
    * id-sorted sample, fixed seed/iters).
    */
  def textQualityModel(s: SparkSession, d: String): DataFrame = {
    val labeled = t(s, d, "documents").select(col("doc_id"), col("text"),
      array_contains(graft.functions.TextFunctions.tokens(col("text")),
        "spark").cast("int").as("label"))
    val m = QualityModel.train(labeled, "doc_id", "text", "label")
    QualityModel.score(labeled, "doc_id", "text", m)
      .select(col("doc_id"), col("pred"))
      .orderBy("doc_id")
  }

  /** DSIR data selection against the same planted rule: target corpus =
    * docs carrying the token, raw = the rest, importance weights from
    * the two hashed-gram LMs, hard top-k at k = |target|. Every
    * with-token doc outranks every without-token doc at sf0.01 AND
    * sf0.1 (measured margins 1.39→9.38 / 0.33→1.02 nats), so the
    * selected SET is the planted rule and the oracle can state it in
    * SQL — the `text_quality_model` pattern, with ranking instead of a
    * trained decision boundary. Gumbel resampling is spec territory
    * (its noise straddles the sf0.1 margin by design — it samples,
    * never thresholds).
    */
  def textDsir(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val hasTok = array_contains(
      graft.functions.TextFunctions.tokens(col("text")), "spark")
    // membership is a column of the one corpus, so the one-pass labeled
    // fit applies (bit-identical to the two-frame form, half the scans)
    val w = Dsir.fitLabeled(docs.withColumn("is_t", hasTok), "is_t", "text")
    Dsir.topK(docs, "doc_id", "text", w,
        docs.filter(hasTok).count().toInt, gumbel = false)
      .select(col("doc_id")).orderBy("doc_id")
  }

  /** Persistent BM25 index end-to-end: build on half the corpus, fold
    * the other half in through the guarded append, search — every
    * statistic (df, N, avgdl) must reflect the appended half, so the
    * result equals the batch scorer over the WHOLE corpus and the
    * `text_bm25` oracle applies verbatim.
    */
  def textBm25Index(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = Scratch.dir("graft_bm25_index")
    val idx = graft.operators.Bm25Index.build(
      docs.filter(col("doc_id") < 250), "doc_id", "text",
      path, "graft_q_bm25", buckets = 8)
    idx.append(docs.filter(col("doc_id") >= 250), "doc_id", "text")
    idx.search(Seq("table", "scan", "join"), 15)
  }

  /** Exact phrase hits from the positional index: built on half the
    * corpus, the rest folded in through the guarded append, then the
    * phrase "table part" answered by position-chain arithmetic over a
    * bucket-pruned scan of just those two terms' postings — the
    * decontamination primitive BM25's tf-only postings cannot express.
    * Oracle replays tokenization and adjacency as a positional
    * self-join in SQL; overlapping matches count on both sides.
    */
  def textPhrase(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = Scratch.dir("graft_phrase")
    val idx = graft.operators.PhraseIndex.build(
      docs.filter(col("doc_id") < 250), "doc_id", "text",
      path, "graft_q_phrase", buckets = 8)
    idx.append(docs.filter(col("doc_id") >= 250), "doc_id", "text")
    idx.phrase(Seq("table", "part")).orderBy("doc_id")
  }

  /** Keyword-in-context rendering of the phrase hits: the ±2-token
    * window around each matching doc's first "table part" — the
    * human-review surface of a decontamination hit; only matched docs
    * re-tokenize.
    */
  def textSnippet(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = Scratch.dir("graft_snip")
    val idx = graft.operators.PhraseIndex.build(docs, "doc_id", "text",
      path, "graft_q_snip", buckets = 8)
    idx.snippets(docs, "doc_id", "text", Seq("table", "part"), width = 2)
      .orderBy("doc_id")
  }

  /** Proximity screen from the same index machinery: docs where "spark"
    * occurs within 3 tokens of "vector", with the true minimal gap —
    * the co-occurrence audit shape ("entity X near entity Y") at
    * postings cost instead of a corpus scan.
    */
  def textNear(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val path = Scratch.dir("graft_nearidx")
    val idx = graft.operators.PhraseIndex.build(docs, "doc_id", "text",
      path, "graft_q_near", buckets = 8)
    idx.near("spark", "vector", window = 3).orderBy("doc_id")
  }

  /** BM25 top-15 docs for a fixed 3-term query; ordering uses the ROUNDED
    * score so near-equal sums (whose last bits depend on summation order)
    * tie-break on doc_id identically in both engines.
    */
  def textBm25(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bm25(t(s, d, "documents"), "doc_id", "text",
        Seq("table", "scan", "join"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(15)
      .select(col("doc_id"), col("score"))

  /** Top repeated 10-token spans across documents — the exact-substring
    * duplication signal; only duplicate documents share spans this long
    * in the fixture corpus.
    */
  def textSpans(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repeatedSpans(t(s, d, "documents"), "doc_id", "text", 10)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("ngram"))
      .limit(20)

  /** PII redaction digest per document. The fixture corpus carries no PII,
    * so the redaction is the identity here — the oracle still re-runs the
    * same RE2-compatible patterns, and TextAnalysisSpec plants real
    * emails/IPs/phones to pin the rewrite behavior.
    */
  def textRedact(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        md5(TextAnalysis.redactPii(col("text"))).as("digest"))
      .orderBy("doc_id")

  /** Corpus-trained bigram LM score per document (model-based quality
    * filtering). Output order and rounding as elsewhere.
    */
  def textLmScore(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bigramLmScore(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** TF-IDF top terms per document — tf/df over the WHOLE corpus, output
    * truncated to the first 30 docs' top-3 terms (rank ties broken by
    * term, deterministic).
    */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    TextAnalysis.tfIdf(t(s, d, "documents"), "doc_id", "text")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3 && col("doc_id") < 30)
      .select(col("doc_id"), col("rnk"), col("term"),
        round(col("tfidf"), 4).as("score"))
      .orderBy("doc_id", "rnk")
  }

  /** C4-rule boilerplate stripping over the same 10-token lined corpus
    * view as `text_linededup`: lines appearing in ≥3 DISTINCT documents
    * are removed from every document (vs lineDedup's keep-first). The
    * per-doc kept/removed counts plus the md5 of the reassembled text
    * pin the exact removal set and order.
    */
  def textBoilerplate(s: SparkSession, d: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val n = greatest(ceil(size(toks).cast("double") / 10.0), lit(1L))
    val lined = t(s, d, "documents").select(col("doc_id"),
      array_join(transform(sequence(lit(1L), n),
        i => array_join(slice(toks, ((i - lit(1L)) * 10 + 1).cast("int"),
          lit(10)), " ")), "\n").as("text"))
    Dedup.stripBoilerplate(lined, "doc_id", "text", minDocs = 3)
      .select(col("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("digest"))
      .orderBy("doc_id")
  }

  /** Reciprocal-rank fusion of two retrievers over the corpus: the BM25
    * list for a fixed keyword query and the dense-cosine list for vector
    * 0, each ranked by its ROUNDED score (engine-stable order), fused
    * with c = 60. Top-20 consensus documents with membership counts.
    */
  def textRrf(s: SparkSession, d: String): DataFrame = {
    val bmTop = TextAnalysis.bm25(t(s, d, "documents"), "doc_id", "text",
        Seq("table", "scan", "join"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    val wB = Window.orderBy(col("score").desc, col("doc_id"))
    val bmRank = bmTop.withColumn("rank", row_number().over(wB))
      .select("doc_id", "rank")
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val cosTop = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(graft.plans.GraftFunctions.cosine(col("embedding"), col("qv")), 6)
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(50)
    val wC = Window.orderBy(col("cos").desc, col("doc_id"))
    val cosRank = cosTop.withColumn("rank", row_number().over(wC))
      .select("doc_id", "rank")
    Similarity.rrfFuse(Seq(bmRank, cosRank), "doc_id", "rank")
      .select(col("doc_id"), round(col("rrf"), 9).as("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** The modern retrieval stack served from the AT-REST indexes: the
    * lexical leg ranks through the persistent BM25 postings index, the
    * vector leg through a saved IVF index at nprobe=all (exact), fused
    * by reciprocal-rank fusion — `text_rrf`'s pipeline with both legs
    * replaced by their serving-path twins. The oracle re-derives both
    * rankings from raw data (the duckAnnTopk precedent: ranking on
    * unrounded cosine is engine-stable at this fixture's cos gaps), so
    * the hash only matches if the indexes reproduce the batch rankings
    * exactly.
    */
  def hybridIndexSearch(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val base = Scratch.dir("graft_hybrid")
    val bmIdx = graft.operators.Bm25Index.build(
      docs, "doc_id", "text", s"$base/bm", "graft_q_hyb_bm", buckets = 8)
    val wB = Window.orderBy(col("score").desc, col("doc_id"))
    val bmRank = bmIdx.search(Seq("table", "scan", "join"), 50)
      .withColumn("rank", row_number().over(wB)).select("doc_id", "rank")
    val emb = t(s, d, "embeddings")
    val ivf = Similarity.IvfIndex.build(
      s, emb, "vec_id", "embedding", nClusters = 16)
    Similarity.IvfIndex.save(ivf, "graft_q_hyb_ivf", s"$base/ivf")
    val opened = Similarity.IvfIndex.open(s, "graft_q_hyb_ivf", s"$base/ivf")
    val q0 = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0).toArray
    val cosRank = opened.search(Map(0L -> q0), k = 50, nprobe = 16)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    Similarity.rrfFuse(Seq(bmRank, cosRank), "doc_id", "rank")
      .select(col("doc_id"), round(col("rrf"), 9).as("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
  }

  /** Native NFC normalization over the corpus: per-doc md5 of the
    * canonicalized text (NFC + lower + whitespace collapse + trim) and
    * its length — the canonical form every dedup/fingerprint pass keys
    * on. Runs the codegen'd `graft_normalize` kernel; the oracle replays
    * it with nfc_normalize + regexp in DuckDB.
    */
  def textNormalize(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        graft.plans.NormalizeText.normalizeText(col("text")).as("norm"))
      .select(col("doc_id"), md5(col("norm")).as("digest"),
        length(col("norm")).as("n_norm"))
      .orderBy("doc_id")

  /** BPE merge training on the corpus: the first 8 learned merges with
    * their pair counts. The training loop (argmax + greedy merge rounds)
    * has no SQL form — rows-only in the driver gate; BpeSpec certifies
    * bit-exact equality with a single-node reference implementation.
    */
  def textBpe(s: SparkSession, d: String): DataFrame = {
    val (merges, _) = graft.operators.Bpe.trainMerges(
      graft.operators.Bpe.wordCounts(t(s, d, "documents"), "text"), k = 8)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((a, b, c), i) => (i, a, b, c) }
      .toDF("rank", "left", "right", "c")
  }

  /** Unigram-LM (SentencePiece) tokenizer training: the 30 most probable
    * learned pieces. Like text_bpe, the training loop (lattice EM +
    * likelihood pruning) has no SQL form — rows-only in the driver gate;
    * UnigramSpec certifies the fit against an exhaustive-enumeration
    * reference and bit-determinism across partitionings.
    */
  def textUnigram(s: SparkSession, d: String): DataFrame = {
    val m = graft.operators.Unigram.train(
      graft.operators.Bpe.wordCounts(t(s, d, "documents"), "text"),
      vocabSize = 60, seedSize = 400, maxPieceLen = 6)
    import s.implicits._
    m.pieces.take(30).zipWithIndex
      .map { case ((p, l), i) =>
        (i, p, BigDecimal(l).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("rank", "piece", "logp")
  }
}
