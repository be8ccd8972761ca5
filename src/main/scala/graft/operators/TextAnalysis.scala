package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * `functions._` expressions (codegen'd, no UDF) except the winnowing
  * sketch, which is still expression-only via higher-order functions.
  *
  * Corpus-level methods (lm score, repeated spans, contamination, bm25)
  * cache the shared tokenize pass; those caches are registered in the
  * mixed-in [[CacheLedger]] — call [[releaseCaches]] between changing
  * ingest batches, exactly as for [[Dedup]].
  */
object TextAnalysis extends CacheLedger {

  /** Marker stopword lists per language — deliberately tiny and fixed so the
    * heuristic is reproducible in plain SQL on any engine.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** N-gram/stopword heuristic language ID. CJK scripts are detected by
    * codepoint range; otherwise the language with the highest marker-token
    * count wins (ties: en > es > fr > de, deterministic). Emits "und" when
    * no marker matches. Delegates to the native [[graft.plans.LangId]]
    * kernel — see [[langIdDeclarative]] for why.
    */
  def langId(text: Column): Column = graft.plans.LangId(text)

  /** The same language ID built purely from `functions._`. Kept as the
    * executable specification for the native kernel (the spec asserts
    * equality), but not the default: the decision `when`-chain references
    * each per-language marker count up to four times and lambda-bearing
    * expressions are excluded from Catalyst's subexpression elimination,
    * so every reference re-scans all tokens — ~10x the native kernel's
    * single pass.
    */
  def langIdDeclarative(text: Column): Column = {
    val toks = TF.tokens(text)
    val s = markers.map { case (l, ws) => l -> markerCount(toks, ws) }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(s("en") >= s("es") && s("en") >= s("fr") && s("en") >= s("de") && s("en") > 0, lit("en"))
      .when(s("es") >= s("fr") && s("es") >= s("de") && s("es") > 0, lit("es"))
      .when(s("fr") >= s("de") && s("fr") > 0, lit("fr"))
      .when(s("de") > 0, lit("de"))
      .otherwise(lit("und"))
  }

  /** Heuristic quality features + a composite score in [0, 1]:
    * length band, alphabetic-character ratio, stopword presence, and
    * repetition (distinct-token ratio). Delegates to the single-pass
    * native [[graft.plans.TextStats]] kernel; see
    * [[qualityColumnsDeclarative]] for the executable specification.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val st = graft.plans.TextStats(text)
    Seq(
      st.getField("n_tokens").as("n_tokens"),
      round(st.getField("alpha_ratio"), 3).as("alpha_ratio"),
      round(st.getField("stopword_ratio"), 3).as("stopword_ratio"),
      round(st.getField("distinct_ratio"), 3).as("distinct_ratio"),
      round(st.getField("quality_score"), 3).as("quality_score"))
  }

  /** The same quality features built purely from `functions._` — the
    * executable specification for [[graft.plans.TextStats]] (the spec
    * asserts equality). Not the default: each ratio and zero-guard
    * references the token array again and lambda-bearing expressions are
    * excluded from subexpression elimination, so the text is re-tokenized
    * ~8x per row, plus a full regexp_replace just to count alpha chars.
    */
  def qualityColumnsDeclarative(text: Column): Seq[Column] = {
    val toks = TF.tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val alphaRatio = when(nChars === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / nChars)
    val allMarkers = markers.values.flatten.toSeq
    val stopRatio = when(nTok === 0, 0.0)
      .otherwise(markerCount(toks, allMarkers).cast("double") / nTok)
    val distinctRatio = when(nTok === 0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / nTok)
    val lengthOk = (nTok >= 10 && nTok <= 100000).cast("double")
    val score = (lengthOk * 0.4) + (alphaRatio * 0.2) + (stopRatio * 0.2) + (distinctRatio * 0.2)
    Seq(
      nTok.cast("long").as("n_tokens"),
      round(alphaRatio, 3).as("alpha_ratio"),
      round(stopRatio, 3).as("stopword_ratio"),
      round(distinctRatio, 3).as("distinct_ratio"),
      round(score, 3).as("quality_score"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex pieces
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCountColumns(text: Column): Seq[Column] = Seq(
    size(TF.tokens(text)).as("ws_tokens"),
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .as("re_tokens"))

  /** Canonical content fingerprint: md5 of the sorted distinct token set.
    * Robust to token order and duplication — the cheap "same bag of words"
    * dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(TF.tokens(text)))))

  /** TF-IDF term weights over the corpus: one row per (doc, term) with
    * tf, df and tf·ln(N/df). Tokenization is whitespace split restricted
    * to ASCII-alphanumeric tokens then lowered — ASCII lowering is
    * engine/locale-independent, so the operator is reproducible in plain
    * SQL on any engine (Unicode `lower()` is not).
    *
    * Shuffle shape at scale: one hash-agg on (doc, term) for tf, one on
    * term for df (counting tf rows — already distinct per doc), a shuffle
    * join back on term, and the 1-row corpus count broadcast. No window,
    * no driver state.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(filter(split(col(textCol), "\\s+"),
          t => t.rlike("^[A-Za-z0-9]+$"))).as("raw"))
      .select(col("doc_id"), lower(col("raw")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  /** Model-based quality scoring with a bigram language model trained on
    * the corpus itself (the CCNet-style filter signal): per document, the
    * mean add-one-smoothed log probability
    * `avg over bigrams of ln((c(w1,w2)+1) / (c(w1)+V))`. Gibberish and
    * boilerplate-repetition both score low against the corpus model.
    *
    * Everything is counts + joins: bigram and unigram count tables (two
    * hash-aggs over exploded tokens), a 1-row vocab size broadcast, and a
    * per-doc re-join of each bigram occurrence to its counts. Scales as
    * two shuffles over token volume — no driver-side model state.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenized base is consumed by three branches (bigrams, unigrams,
    // vocab); cache so the corpus is tokenized once
    val base = docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .cache()
      .transform(ledgered)
    val bg = base.select(col("doc_id"),
        explode(when(size(col("toks")) > 1,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", slice(col("toks"), i, lit(2)))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val c12 = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
    val uni = base.select(explode(col("toks")).as("w"))
    val c1 = uni.groupBy("w").agg(count(lit(1)).as("c1"))
    val v = uni.agg(countDistinct(col("w")).as("v"))
    bg.join(c12, Seq("bg"))
      .join(c1, col("w1") === col("w"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c12") + 1).cast("double") / (col("c1") + col("v")))), 6)
          .as("avg_logp"))
  }

  /** Cross-document repeated spans: every k-token n-gram that occurs in
    * more than one document, with its document and occurrence counts —
    * the exact-substring-duplication signal (the Lee et al. 2022 "dedup
    * makes LMs better" filter shape). One explode + two hash-aggs; at
    * 100 TB you'd group on `xxhash64(ngram)` instead of the string and
    * accept 64-bit-collision odds, but the string form is what a SQL
    * oracle can replicate exactly.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // cache barrier: projections collapse into generators, so exploding
    // the lambda-bearing shingle expression directly would re-evaluate the
    // whole array per OUTPUT row
    val arr = docs.select(col(idCol).as("doc_id"),
      TF.shingles(col(textCol), k).as("g")).cache().transform(ledgered)
    arr.select(col("doc_id"), explode(col("g")).as("ngram"))
      .groupBy("ngram")
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") > 1)
  }

  /** Benchmark decontamination: which corpus documents share at least one
    * n-token shingle with a holdout/benchmark set (the n-gram-overlap
    * contamination check run before every serious training run; n = 8–13
    * in the published recipes). Returns each contaminated corpus doc with
    * the number of distinct holdout shingles it contains — downstream
    * either drops the doc or surgically removes the spans.
    *
    * Scale shape: both sides shuffle only (doc, shingle-hash) rows from
    * ONE shared tokenize pass over the corpus (the holdout rows are
    * filtered from it, not re-tokenized). The distinct holdout-shingle
    * relation is benchmark-sized — millions of grams, not corpus-sized —
    * so it is broadcast and the probe stays narrow; 64-bit shingle
    * hashing keeps the broadcast compact (collision odds ≈ n²/2⁶⁵).
    *
    * @param isHoldout predicate column marking benchmark rows inside docs
    */
  def contamination(
      docs: DataFrame, idCol: String, textCol: String,
      isHoldout: Column, n: Int = 8): DataFrame = {
    // cache barrier: the shingle array is lambda-bearing (no CSE through
    // collapsed projections / generators) and feeds two branches
    val arr = docs.select(col(idCol).as("doc_id"), isHoldout.as("hold"),
      array_distinct(transform(TF.shingles(col(textCol), n),
        s => xxhash64(s))).as("g")).cache().transform(ledgered)
    val grams = arr.select(col("doc_id"), col("hold"), explode(col("g")).as("h"))
    val holdGrams = grams.filter(col("hold")).select("h").distinct()
    grams.filter(!col("hold"))
      .join(broadcast(holdGrams), Seq("h"))
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_shared"))
  }

  /** Span-level decontamination: instead of dropping a contaminated doc
    * (see [[contamination]]), surgically remove every token covered by a
    * shingle the doc shares with the holdout — what production recipes do
    * when the document is otherwise valuable. Tokens are re-joined with
    * single spaces (the same canonicalization the tokenizer applies).
    *
    * Same scale shape as [[contamination]] — one shared tokenize pass,
    * broadcast holdout grams — plus a (doc, position) anti-join and an
    * ordered re-assembly (sort_array over (pos, token) structs inside the
    * per-doc agg, so reassembly is deterministic under any partitioning).
    *
    * @return contaminated corpus docs only:
    *         (doc_id, n_removed, clean_text) — clean_text = "" when the
    *         whole document was covered
    */
  def removeContaminatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      isHoldout: Column, n: Int = 8): DataFrame = {
    // cache barrier: token array is lambda-bearing and feeds three branches
    val arr = docs.select(col(idCol).as("doc_id"), isHoldout.as("hold"),
      TF.tokens(col(textCol)).as("toks")).cache().transform(ledgered)
    val cnt = size(col("toks")) - lit(n - 1)
    val hashes = when(cnt > 0,
      transform(sequence(lit(0), cnt - 1),
        i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
    val grams = arr.select(col("doc_id"), col("hold"),
      posexplode(hashes).as(Seq("pos", "h")))
    val holdGrams = grams.filter(col("hold")).select("h").distinct()
    val hits = grams.filter(!col("hold"))
      .join(broadcast(holdGrams), Seq("h"))
      .select(col("doc_id"), col("pos"))
    stripPositions(arr.filter(!col("hold")), hits, n)
  }

  /** Shared strip-and-reassemble tail of the span-removal operators:
    * expand each hit k-gram start into its covered token positions, drop
    * those tokens, and re-join the survivors with single spaces (ordered
    * re-assembly — sort_array over (pos, token) structs inside the
    * per-doc agg, so the rebuild is deterministic under any partitioning).
    *
    * @param arr  (doc_id, toks) one row per candidate doc
    * @param hits (doc_id, pos) start position of each k-gram to remove
    * @return affected docs only: (doc_id, n_removed, clean_text)
    */
  private def stripPositions(arr: DataFrame, hits: DataFrame, k: Int): DataFrame = {
    val covered = hits
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("j"))
      .distinct()
    val nRemoved = covered.groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
    val kept = arr
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("j", "tok")))
      .join(covered, Seq("doc_id", "j"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("j"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    nRemoved.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus SELF-dedup of repeated spans — the Lee et al. 2022
    * "ExactSubstr" shape over token k-grams: every k-gram that occurs in
    * more than one document survives only in its FIRST document (min
    * doc_id) and the covered tokens are removed everywhere else.
    * [[repeatedSpans]] is the detector; this is the surgical remover, and
    * unlike [[removeContaminatedSpans]] there is no privileged holdout —
    * the corpus is deduplicated against itself.
    *
    * Scale shape: ONE tokenize pass; the gram relation shuffles (doc,
    * pos, hash) rows; the first-owner relation is grams that repeat
    * across docs — corpus-sized in the worst case, so it stays a shuffle
    * join on the gram hash, never a broadcast (contamination's broadcast
    * trick applies only when one side is benchmark-sized). Keep-first is
    * a deterministic min, so output is partitioning-invariant.
    *
    * @return affected docs only: (doc_id, n_removed, clean_text)
    */
  def removeRepeatedSpans(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    // cache barrier: token array is lambda-bearing and feeds two branches
    val arr = docs.select(col(idCol).as("doc_id"),
      TF.tokens(col(textCol)).as("toks")).cache().transform(ledgered)
    val cnt = size(col("toks")) - lit(k - 1)
    val hashes = when(cnt > 0,
      transform(sequence(lit(0), cnt - 1),
        i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    val grams = arr.select(col("doc_id"), posexplode(hashes).as(Seq("pos", "h")))
    val firstOwner = grams.groupBy("h")
      .agg(min(col("doc_id")).as("first_doc"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select("h", "first_doc")
    val hits = grams.join(firstOwner, Seq("h"))
      .filter(col("doc_id") =!= col("first_doc"))
      .select(col("doc_id"), col("pos"))
    stripPositions(arr, hits, k)
  }

  /** BM25 lexical retrieval scores for a term query over the corpus — the
    * keyword complement to the ANN embedding family. Lucene-form idf
    * `ln(1 + (N-df+0.5)/(df+0.5))`, standard k1/b length normalization.
    *
    * Shuffle shape: token stats (tf per doc for QUERY terms only, df per
    * term, doc lengths) are three hash-aggs over one exploded token pass;
    * corpus-level N/avgdl is a 1-row broadcast. Only documents containing
    * ≥1 query term survive — the inverted-list behavior that keeps the
    * score join proportional to postings, not corpus size.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // cache barrier: the token array is lambda-bearing (no CSE through
    // collapsed projections / generators)
    val arr = docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .cache()
      .transform(ledgered)
    val toks = arr.select(col("doc_id"), explode(col("toks")).as("term"))
    val dl = arr.select(col("doc_id"), size(col("toks")).as("dl"))
    val stats = dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfreq, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * norm).as("w"))
      .groupBy("doc_id")
      .agg(round(sum(col("w")), 6).as("score"))
  }

  /** PII redaction for training corpora: emails, IPv4 addresses and
    * phone-like digit runs are replaced with typed placeholder tokens.
    * Patterns are deliberately RE2-compatible (no backrefs or lookaround)
    * so the same regexes run identically on Java-regex (Spark) and
    * RE2-based engines — which is what makes the operator SQL-oracle
    * checkable. Pure `regexp_replace` chain: codegen'd, narrow, no UDF.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\+[0-9][0-9()\\s.-]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Winnowing sketch (Schleimer et al., SIGMOD'03): rolling-hash every
    * k-shingle, slide a window of `w` hashes, keep each window's minimum;
    * the sorted distinct minima form the fingerprint. Delegates to the
    * native [[graft.plans.Winnow]] expression — the equivalent nested
    * higher-order-function form re-evaluates inner arrays per outer element
    * (no CSE) and is O(n²·w) per document.
    */
  def winnow(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.plans.Winnow(text, k, w)

  /** Corpus-level PMI bigram collocations — which adjacent word pairs occur
    * far more often than their unigram frequencies predict (the classic
    * collocation-mining signal; in a training-data pipeline it surfaces
    * boilerplate phrases and multi-word entities worth tokenizing as
    * units).
    *
    * pmi(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) = c_xy / N_bigrams
    * and p(x) = c_x / N_tokens. Every factor is an exact integer count, so
    * the double arithmetic is engine-identical as long as the expression
    * shape matches (the oracle mirrors it verbatim).
    *
    * Scale shape: ONE tokenize pass (cached, ledgered) feeds both the
    * unigram and the bigram count; each is a single map-side-combined hash
    * aggregate. The unigram table is vocabulary-sized, joined back to the
    * (minCount-filtered) bigram table on each side — at 100 TB both joins
    * key on a token string with Zipf skew absorbed by the pre-aggregation
    * (counts, not occurrences, are what shuffle).
    *
    * @param minCount drop bigrams rarer than this (PMI of singletons is
    *                 pure noise and would dominate the top of the ranking)
    * @return (x, y, cxy, pmi) — one row per surviving bigram
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long = 5): DataFrame = {
    val arr = ledgered(docs.select(TF.tokens(col(textCol)).as("toks")).cache())
    val bigrams = arr.select(explode(
      when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("x"),
            element_at(col("toks"), i + 1).as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
    val bcnt = bigrams.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    val toks = arr.select(explode(col("toks")).as("tok"))
    val ucnt = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = toks.agg(count(lit(1)).as("nt"))
      .crossJoin(bigrams.agg(count(lit(1)).as("nb")))
    bcnt
      .join(ucnt.select(col("tok").as("x"), col("c").as("cx")), "x")
      .join(ucnt.select(col("tok").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(totals))
      .select(col("x"), col("y"), col("cxy"),
        // all-double product chain: counts stay < 2^53 so every
        // intermediate is exact, and no long-multiply can overflow at
        // corpus scale
        log(col("cxy").cast("double") * col("nt").cast("double") * col("nt") /
          (col("nb").cast("double") * col("cx") * col("cy"))).as("pmi"))
  }

  /** Token co-occurrence counts within a forward window: ordered pairs
    * (x, y) where y follows x within `window` tokens, with occurrence
    * counts — the input matrix of GloVe/word2vec-style embedding training
    * and of collocation mining beyond adjacency ([[pmiBigrams]] is the
    * window=1 special case).
    *
    * Pair generation is NARROW: for each offset 1..window the token array
    * is zipped with its own off-shifted slice (`zip_with` pads the tail
    * with nulls, filtered after the explode), so no self-join and no
    * position table ever exist — the only shuffle is the final
    * map-side-combined count aggregate, and what shuffles is (x, y)
    * pairs already reduced per partition. At 100 TB the reduction keys
    * are vocabulary², Zipf-skewed but absorbed by partial aggregation.
    */
  def cooccurrence(
      docs: DataFrame, textCol: String, window: Int,
      minCount: Long = 1): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val offs = (1 to window).map { off =>
      zip_with(col("toks"),
        slice(col("toks"), lit(off + 1), greatest(size(col("toks")) - off, lit(0))),
        (x, y) => struct(x.as("x"), y.as("y")))
    }
    docs.select(TF.tokens(col(textCol)).as("toks"))
      .select(explode(flatten(array(offs: _*))).as("p"))
      .filter(col("p.y").isNotNull)
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
  }

  /** Per-document lexical diversity: token count, distinct-type count,
    * type-token ratio, and Shannon entropy of the token distribution (in
    * nats). Low entropy / low TTR flags template or keyword-stuffed pages —
    * a standard quality gate next to [[qualityColumns]].
    *
    * Entropy uses the aggregation-friendly identity
    * H = ln(n) − (Σ c·ln c) / n, so the whole computation is two hash
    * aggregates: (doc, token) counts (map-side combined — the only
    * full-data shuffle), then a per-doc rollup. No token array ever
    * shuffles whole.
    *
    * @return (doc_id, n_tokens, n_types, ttr, entropy)
    */
  /** Frequency-ranked vocabulary of the `size` most common tokens:
    * `(token, c, id)` with ids 1..size assigned by (count desc, token asc)
    * — the deterministic total order two engines can agree on.
    *
    * Scale shape: one map-side-combined hash aggregate over all tokens
    * (the only full-data shuffle), then `orderBy.limit` — Spark plans
    * TakeOrderedAndProject, a per-partition top-`size` heap merged on one
    * reducer, NOT a global sort. The final `row_number` window runs over
    * the `size` surviving rows on a single partition, which is exactly
    * right for a vocabulary (10⁴–10⁵ rows) and never sees corpus-sized
    * data.
    */
  def buildVocab(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size >= 1, s"vocab size must be >= 1: $size")
    docs.select(explode(TF.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(size)
      .withColumn("id", row_number().over(Window.orderBy(col("c").desc, col("token"))))
  }

  /** Encode each document as its token-id sequence under `vocab` (from
    * [[buildVocab]]): `(doc_id, ids)` with out-of-vocabulary tokens mapped
    * to id 0 so sequence length is preserved — the tokenizer-application
    * step of a training pipeline.
    *
    * The vocab side broadcasts (it is vocabulary-sized by construction),
    * so the probe is a narrow hash lookup per token; the only shuffle is
    * the per-document regroup, and what shuffles is (pos, id) ints —
    * never the text. Order is restored by sorting each collected list on
    * the token position, making the result partitioning-independent.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TF.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), coalesce(col("id"), lit(0)).as("id")))),
        x => x.getField("id")).as("ids"))

  def lexicalDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokCounts = docs
      .select(col(idCol).as("doc_id"), explode(TF.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
    tokCounts.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        (log(sum(col("c")).cast("double")) -
          sum(col("c").cast("double") * log(col("c").cast("double"))) /
            sum(col("c")).cast("double")).as("entropy"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        col("entropy"))
  }

  /** Filter-funnel attribution: tag every row with the FIRST quality rule
    * it fails (null = survivor) — the per-rule attrition report every
    * pipeline needs to answer "where did my corpus go?". Ordered
    * first-fail attribution (not per-rule independent counts) makes the
    * report additive: bucket sizes sum to the corpus size, and a rule's
    * count is exactly the documents IT removed given everything upstream.
    *
    * `rules` are (name, PASS-condition) in pipeline order. Narrow — one
    * CASE chain, no shuffle; aggregate the output yourself (e.g.
    * `groupBy("fail_rule").count`).
    */
  def filterFunnel(
      df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)],
      outCol: String = "fail_rule"): DataFrame = {
    require(rules.nonEmpty, "filterFunnel needs at least one rule")
    val verdict = rules.foldLeft(when(lit(false), lit(null.asInstanceOf[String]))) {
      case (acc, (name, pass)) => acc.when(!coalesce(pass, lit(false)), lit(name))
    }.otherwise(lit(null.asInstanceOf[String]))
    df.withColumn(outCol, verdict)
  }
}
