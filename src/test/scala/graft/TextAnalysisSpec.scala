package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    spark.createDataFrame(Seq(Tuple1(text))).toDF("text").select(c).head().get(0)

  test("langId picks marker-dominant language; CJK wins; und fallback") {
    assert(one("the cat of the house and a dog", TextAnalysis.langId(col("text"))) == "en")
    assert(one("el perro y la casa de los gatos", TextAnalysis.langId(col("text"))) == "es")
    assert(one("le chien et les chats des villes", TextAnalysis.langId(col("text"))) == "fr")
    assert(one("der hund und die katze ist ein tier", TextAnalysis.langId(col("text"))) == "de")
    assert(one("你好世界", TextAnalysis.langId(col("text"))) == "zh")
    assert(one("xyzzy plugh quux", TextAnalysis.langId(col("text"))) == "und")
  }

  test("native langId kernel == declarative form on random and edge inputs") {
    val rnd = new scala.util.Random(11)
    val vocab = TextAnalysis.markers.values.flatten.toSeq ++
      Seq("cat", "maison", "hund", "casa", "", "你", "word42", "a-b")
    val docs = (0 until 300).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } ++ Seq("", " ", "  la  ", "la", "de de des", "the el le der",
      "mixed 你好 text the", "\tthe\n")
    val df = spark.createDataFrame(docs.map(Tuple1(_))).toDF("text")
      .select(
        TextAnalysis.langId(col("text")).as("native"),
        TextAnalysis.langIdDeclarative(col("text")).as("decl"))
    assert(df.filter(col("native") =!= col("decl")).count() == 0)
  }

  test("native TextStats kernel == declarative quality columns") {
    val rnd = new scala.util.Random(17)
    val vocab = TextAnalysis.markers.values.flatten.toSeq ++
      Seq("cat", "Maison", "WORD42", "a-b!", "你好", "x")
    val docs = (0 until 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } ++ Seq("", " ", "  the the  ", "你好世界", "a" * 50)
    val df = spark.createDataFrame(docs.map(Tuple1(_))).toDF("text")
    val native = df.select(col("text") +: TextAnalysis.qualityColumns(col("text")): _*)
    val decl = df.select(col("text") +: TextAnalysis.qualityColumnsDeclarative(col("text")): _*)
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
  }

  test("quality score is in [0,1] and penalizes repetition") {
    val df = spark.createDataFrame(Seq(
      Tuple1(("good " * 5 + "the and of is a text with many distinct words here now")),
      Tuple1(("spam " * 50).trim)))
      .toDF("text")
      .select(col("text") +: TextAnalysis.qualityColumns(col("text")): _*)
    val rows = df.collect()
    val scores = rows.map(_.getAs[Double]("quality_score"))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1)) // repetitive doc scores lower
  }

  test("token counts: whitespace vs regex pieces") {
    val df = spark.createDataFrame(Seq(Tuple1("hello world42, foo-bar!")))
      .toDF("text")
      .select(TextAnalysis.tokenCountColumns(col("text")): _*)
    val r = df.head()
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello | world | 42 | , | foo | - | bar | !
    assert(r.getAs[Int]("re_tokens") == 8)
  }

  test("fingerprint is invariant to token order and duplication") {
    val fp = (t: String) => one(t, TextAnalysis.fingerprint(col("text")))
    assert(fp("a b c") == fp("c b a"))
    assert(fp("a b c") == fp("a a b b c"))
    assert(fp("a b c") != fp("a b d"))
  }

  test("tfIdf: corpus-wide term weights match hand computation") {
    val docs = spark.createDataFrame(Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry date!"))).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    def close(k: (Long, String), tf: Long, df: Long, w: Double): Boolean = {
      val (gtf, gdf, gw) = got(k)
      gtf == tf && gdf == df && math.abs(gw - w) < 1e-12
    }
    // apple: only doc 0, tf 2 -> 2 * ln(3/1)
    assert(close((0L, "apple"), 2L, 1L, 2.0 * math.log(3.0)))
    // banana: docs 0 and 1 -> ln(3/2) each at tf 1
    assert(close((0L, "banana"), 1L, 2L, math.log(1.5)))
    assert(close((1L, "banana"), 1L, 2L, math.log(1.5)))
    // "date!" fails the ASCII-alphanumeric token filter entirely
    assert(!got.keySet.exists(_._2.contains("date")))
    // cherry in doc 2 twice
    assert(close((2L, "cherry"), 2L, 2L, 2.0 * math.log(1.5)))
  }

  test("bigram LM score matches hand computation on a tiny corpus") {
    val docs = spark.createDataFrame(Seq(
      (0L, "a b a b"),
      (1L, "a b c"))).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus counts: c("a b")=3, c("b a")=1, c("b c")=1; c(a)=3, c(b)=3; V=3
    // every term divides by c(w1)+V where w1 is the FIRST word of the bigram
    val ab = math.log(4.0 / 6.0); val ba = math.log(2.0 / 6.0)
    val bc = math.log(2.0 / 6.0)
    assert(got(0L)._1 == 3 && math.abs(got(0L)._2 - (2 * ab + ba) / 3) < 1e-6)
    assert(got(1L)._1 == 2 && math.abs(got(1L)._2 - (ab + bc) / 2) < 1e-6)
  }

  test("PII redaction replaces emails, IPs and phone runs, leaves clean text alone") {
    val rows = Seq(
      (0L, "contact bob.smith+x@example.co.uk for details"),
      (1L, "server at 192.168.1.254 responded"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "nothing sensitive here at all"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "contact <EMAIL> for details")
    assert(got(1L) == "server at <IP> responded")
    assert(got(2L) == "call <PHONE> now")
    assert(got(3L) == "nothing sensitive here at all")
  }

  test("dirty corpus: null / empty / whitespace docs flow through every operator without errors") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps the lazy dog again"),
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "   ")).toDF("doc_id", "text")
    // null text null-propagates (SQL semantics); empty/whitespace docs
    // produce zeros and empties — nothing throws on a dirty corpus.
    val lang = docs.select(TextAnalysis.langId(col("text"))).collect().map(_.get(0))
    assert(lang.toSeq == Seq("en", null, "und", "und"))
    val q = docs.select(TextAnalysis.qualityColumns(col("text")): _*).collect()
    assert(q(1).isNullAt(0) && q(2).getLong(0) == 0L && q(3).getLong(0) == 0L)
    assert(docs.select(TextAnalysis.redactPii(col("text"))).collect()(1).isNullAt(0))
    // corpus-level operators just skip token-less docs
    assert(TextAnalysis.tfIdf(docs, "doc_id", "text")
      .select("doc_id").distinct().count() == 1)
    assert(TextAnalysis.bigramLmScore(docs, "doc_id", "text").count() == 1)
    assert(graft.operators.Dedup.minHashPairs(docs, "doc_id", "text").count() == 0)
    // round-5 operators: token-less docs skip (null text) or contribute
    // nothing (empty), never throw
    assert(TextAnalysis.pmiBigrams(docs, "text", minCount = 1).count() > 0)
    assert(TextAnalysis.cooccurrence(docs, "text", window = 2).count() > 0)
    val div = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(div == Set(0L)) // only the real doc has a token distribution
    val vocab = TextAnalysis.buildVocab(docs, "text", 5)
    assert(vocab.count() == 5)
    assert(TextAnalysis.encode(docs, "doc_id", "text", vocab)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L))
    // empty doc → one empty chunk; null doc → no rows
    val ch = graft.operators.Packing.slidingChunks(docs, "doc_id", "text", 4, 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ch == Set(0L, 2L, 3L))
  }

  test("contamination flags docs sharing an n-gram with the holdout, and only those") {
    import spark.implicits._
    val benchGram = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (0L, s"benchmark question says $benchGram end of prompt"),       // holdout
      (1L, s"scraped page quoting $benchGram verbatim among text"),    // contaminated
      (2L, "completely unrelated document with plenty of words here"), // clean
      (3L, "alpha beta gamma delta epsilon zeta eta iota differs"),    // 8-prefix differs at token 8
      (4L, "short doc")                                                // < n tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(docs, "doc_id", "text",
        col("doc_id") === 0L, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
    // an exact duplicate of a holdout doc shares every shingle
    val withDup = docs.union(Seq((5L,
      s"benchmark question says $benchGram end of prompt")).toDF("doc_id", "text"))
    val dup = TextAnalysis.contamination(withDup, "doc_id", "text",
        col("doc_id") === 0L, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup(5L) == 7L) // 14 tokens -> 7 distinct 8-gram shingles
  }

  test("removeContaminatedSpans excises exactly the covered tokens, keeps the rest") {
    import spark.implicits._
    val gram = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (0L, s"holdout has $gram inside"),
      (1L, s"prefix words here $gram suffix words tail"),      // one hit mid-doc
      (2L, "totally clean document nothing shared with holdout"),
      (3L, gram)                                               // fully covered
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeContaminatedSpans(docs, "doc_id", "text",
        col("doc_id") === 0L, n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // doc 1: the 8 gram tokens go, the 3-token prefix and 3-token suffix stay
    assert(got(1L) == ((8L, "prefix words here suffix words tail")))
    // doc 3 was nothing but the shared gram -> empty remainder
    assert(got(3L) == ((8L, "")))
    // clean docs and the holdout itself are not in the output
    assert(got.keySet == Set(1L, 3L))
  }

  test("removeRepeatedSpans keeps the first occurrence, strips the rest") {
    import spark.implicits._
    val gram = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (5L, s"first owner says $gram and moves on"),   // min doc_id → keeps it
      (7L, s"second copy of $gram appears here"),     // stripped
      (9L, gram),                                     // stripped to empty
      (11L, "entirely original text with no repeats at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeRepeatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // only the non-first owners are affected; the first owner and the
    // original doc never appear in the output
    assert(got.keySet == Set(7L, 9L))
    assert(got(7L) == ((8L, "second copy of appears here")))
    assert(got(9L) == ((8L, "")))
    // determinism: repartitioned input produces the identical result
    val again = TextAnalysis.removeRepeatedSpans(
        docs.repartition(7), "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(again == got)
  }

  test("pmiBigrams matches the hand-computed PMI on a tiny corpus") {
    import spark.implicits._
    // unigrams: a=3 b=3 c=1 (N=7); bigrams: (a,b)=3 (b,a)=1 (b,c)=1 (Nb=5)
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b"))._1 == 3L)
    assert(math.abs(got(("a", "b"))._2 - math.log(3.0 * 7 * 7 / (5.0 * 3 * 3))) < 1e-12)
    assert(math.abs(got(("b", "c"))._2 - math.log(1.0 * 7 * 7 / (5.0 * 3 * 1))) < 1e-12)
    assert(got.size == 3)
    // minCount drops the singletons
    val filtered = TextAnalysis.pmiBigrams(docs, "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(filtered.toSeq == Seq(("a", "b")))
  }

  test("cooccurrence counts forward-window pairs, not adjacency only") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d"), (1L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(docs, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc0 window-2 pairs: ab ac bc bd cd; doc1: ab
    assert(got == Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L))
    // window=1 degenerates to adjacent bigram counts
    val w1 = TextAnalysis.cooccurrence(docs, "text", window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w1 == Map(("a", "b") -> 2L, ("b", "c") -> 1L, ("c", "d") -> 1L))
    // minCount filters
    assert(TextAnalysis.cooccurrence(docs, "text", 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
  }

  test("buildVocab ranks by count desc then token asc; encode maps OOV to 0") {
    import spark.implicits._
    // counts: b=4, a=3, c=2, d=1 → vocab(3): b=1, a=2, c=3; d is OOV
    val docs = Seq((0L, "a b a b c"), (1L, "b b a c d")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", 3)
    val v = vocab.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(v == Map("b" -> ((4L, 1)), "a" -> ((3L, 2)), "c" -> ((2L, 3))))
    val enc = TextAnalysis.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(0L) == Seq(2, 1, 2, 1, 3))
    assert(enc(1L) == Seq(1, 1, 2, 3, 0)) // d → 0, position preserved
  }

  test("encode is partitioning-independent (order restored by position)") {
    import spark.implicits._
    val docs = Seq((0L, "x y z w v u t s r q")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", 10)
    val a = TextAnalysis.encode(docs, "doc_id", "text", vocab)
      .collect().head.getSeq[Int](1)
    val b = TextAnalysis.encode(docs.repartition(7), "doc_id", "text", vocab)
      .collect().head.getSeq[Int](1)
    assert(a == b && a.length == 10)
  }

  test("lexicalDiversity: TTR and entropy hand-check") {
    import spark.implicits._
    val docs = Seq((0L, "a a b"), (1L, "x y z"), (2L, "w w w w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // doc 0: n=3, types=2, H = ln3 - (2 ln2)/3
    assert(got(0L)._1 == 3L && got(0L)._2 == 2L)
    assert(math.abs(got(0L)._3 - 2.0 / 3) < 1e-12)
    assert(math.abs(got(0L)._4 - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12)
    // uniform distribution: H = ln(n_types)
    assert(math.abs(got(1L)._4 - math.log(3)) < 1e-12)
    // single repeated token: zero entropy, minimal TTR
    assert(got(2L)._4 == 0.0 && got(2L)._3 == 0.25)
  }

  test("filterFunnel: first-fail attribution, null-safe, buckets additive") {
    import org.apache.spark.sql.functions.{col, length}
    val rows = Seq(
      (0L, "good long text here", "en"),    // survives
      (1L, null.asInstanceOf[String], "en"), // fails nonempty (null-safe)
      (2L, "short", "en"),                   // fails minlen
      (3L, "plenty of text follows", "fr"),  // fails lang FIRST (order!)
      (4L, "x", "fr"))                       // fails lang (before minlen)
    val df = spark.createDataFrame(rows).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.filterFunnel(df, Seq(
        "nonempty" -> (length(col("text")) > 0),
        "lang_en" -> (col("lang") === "en"),
        "minlen" -> (length(col("text")) >= 10)))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) "survived" else r.getString(3))).toMap
    assert(got == Map(0L -> "survived", 1L -> "nonempty", 2L -> "minlen",
      3L -> "lang_en", 4L -> "lang_en"))
  }

  test("graft_normalize: NFC composition, case, whitespace — codegen == kernel") {
    import org.apache.spark.sql.functions.col
    import graft.plans.NormalizeText
    val cases = Seq(
      "Café du   Monde",   // combining accent -> composed é; run of spaces
      "\tleading and trailing\n ",
      "ALL CAPS  MiXeD",
      "already clean",
      "Ångström vs Ångström", // Å composed == decomposed
      "")
    val df = spark.createDataFrame(cases.zipWithIndex.map {
      case (s, i) => (i.toLong, s)
    }).toDF("id", "s")
    val got = df.select(col("id"), NormalizeText.normalizeText(col("s")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "café du monde")
    assert(got(1L) == "leading and trailing")
    assert(got(2L) == "all caps mixed")
    assert(got(3L) == "already clean")
    // composed and decomposed forms normalize identically
    val halves = got(4L).split(" vs ")
    assert(halves(0) == halves(1), got(4L))
    assert(got(5L) == "")
    // interpreted eval agrees with the generated path
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(NormalizeText.normalize(s) == got(i.toLong))
    }
    // null passes through
    val n = df.selectExpr("CAST(NULL AS STRING) AS s")
      .select(NormalizeText.normalizeText(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("winnow sketch: subset stability under small edits") {
    val sk = (t: String) =>
      one(t, TextAnalysis.winnow(col("text")))
        .asInstanceOf[scala.collection.Seq[Long]].toSet
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val edited = base + " thirteen"
    val a = sk(base); val b = sk(edited)
    assert((a & b).size * 2 >= a.size) // most fingerprints survive an append
    assert(sk("tiny doc").nonEmpty)    // shorter than window still fingerprints
  }
}
