package graft

import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.DataFrame

/** Unigram-LM tokenizer training: the distributed lattice EM must match
  * an exhaustive-enumeration reference (every segmentation of every word
  * enumerated — a different algorithm computing the same posterior), be
  * bit-deterministic across partitionings, and encode with standard
  * longest-frequent-piece behavior.
  */
class UnigramSpec extends SparkSpec {

  private def wc(corpus: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    corpus.toDF("word", "count")
  }

  // ---- exhaustive-enumeration reference (no lattices, no log space) ----

  private def segmentations(w: String, vocab: Set[String],
      maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap { k =>
      val h = w.substring(0, k)
      if (vocab(h)) segmentations(w.substring(k), vocab, maxLen).map(h +: _)
      else Seq.empty
    }

  /** Exact posterior expected counts by enumerating every segmentation. */
  private def refExpected(words: Seq[(String, Long)],
      p: Map[String, Double], maxLen: Int): Map[String, Double] = {
    val acc = scala.collection.mutable.Map.empty[String, Double]
    words.foreach { case (w, cnt) =>
      val segs = segmentations(w, p.keySet, maxLen)
      val probs = segs.map(_.map(s => math.exp(p(s))).product)
      val z = probs.sum
      if (z > 0) segs.zip(probs).foreach { case (seg, pr) =>
        seg.foreach(piece =>
          acc(piece) = acc.getOrElse(piece, 0.0) + pr / z * cnt)
      }
    }
    acc.toMap
  }

  private val corpus = Seq[(String, Long)](
    ("hello", 10L), ("hell", 4L), ("low", 7L), ("lower", 5L),
    ("lowest", 3L), ("hollow", 2L), ("well", 6L))

  test("trained model matches the exhaustive-enumeration reference") {
    val m = Unigram.train(wc(corpus), vocabSize = 20, seedSize = 60,
      maxPieceLen = 4, emIters = 2)
    // replay the reference: same seed, same schedule, enumeration E-step
    var ref: Map[String, Double] = {
      val subs = scala.collection.mutable.Map.empty[String, Long]
      corpus.foreach { case (w, c) =>
        for (i <- 0 until w.length; j <- (i + 1) to math.min(w.length, i + 4))
          subs(w.substring(i, j)) = subs.getOrElse(w.substring(i, j), 0L) + c
      }
      val (chars, multi) = subs.toSeq.partition(_._1.length == 1)
      val seed = chars.sortBy(_._1) ++ multi
        .sortBy { case (p, c) => (-c * p.length, p) }
        .take(60 - chars.length)
      val tot = seed.map(_._2.toDouble).sum
      seed.map { case (p, c) => (p, math.log(c / tot)) }.toMap
    }
    def norm(c: Map[String, Double]): Map[String, Double] = {
      val r = c.map { case (p, v) =>
        (p, BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val t = r.values.sum
      r.map { case (p, v) =>
        (p, if (v <= 0) -1e9 else math.log(v) - math.log(t))
      }
    }
    def viterbiAlt(s: String, lp: Map[String, Double]): Double =
      segmentations(s, lp.keySet - s, 4) match {
        case Seq() => Double.NegativeInfinity
        case segs => segs.map(_.map(lp).sum).max
      }
    var vocab = ref.size
    while (vocab > 20) {
      (1 to 2).foreach(_ => ref = norm(refExpected(corpus, ref, 4)))
      val counts = refExpected(corpus, ref, 4).map { case (p, v) =>
        (p, BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val (chars, multi) = ref.keys.toSeq.partition(_.length == 1)
      val keep = math.max(20 - chars.length,
        math.min(multi.length - 1, (multi.length * 0.75).toInt))
      val kept = multi.map { p =>
        val loss = counts.getOrElse(p, 0.0) * (ref(p) - viterbiAlt(p, ref))
        (p, BigDecimal(loss).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (p, l) => (-l, p) }.take(keep).map(_._1)
      ref = (chars ++ kept).map(p => (p, ref(p))).toMap
      vocab = ref.size
    }
    (1 to 2).foreach(_ => ref = norm(refExpected(corpus, ref, 4)))
    assert(m.pieces.map(_._1).toSet == ref.keySet,
      s"piece sets must agree\n got=${m.pieces.map(_._1).sorted}\n " +
        s"ref=${ref.keys.toSeq.sorted}")
    m.pieces.foreach { case (p, l) =>
      assert(math.abs(l - ref(p)) < 1e-9,
        s"logp($p): lattice $l vs enumeration ${ref(p)}")
    }
  }

  test("bit-deterministic across partitionings") {
    val a = Unigram.train(wc(corpus), 20, 60, 4)
    val b = Unigram.train(wc(corpus).repartition(7), 20, 60, 4)
    assert(a.pieces == b.pieces, "the fit is a pure function of the corpus")
  }

  test("single characters survive any pruning; every word stays encodable") {
    val m = Unigram.train(wc(corpus), vocabSize = 8, seedSize = 60,
      maxPieceLen = 4)
    val chars = corpus.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(m.pieces.map(_._1).toSet))
    corpus.foreach { case (w, _) =>
      val enc = Unigram.encodeWord(w, m.logp, m.maxLen)
      assert(enc.mkString == w, s"lossless: $w -> $enc")
    }
  }

  test("encode is max-likelihood: multi-char piece wins iff its logp beats the char path") {
    import spark.implicits._
    // hand-set model: p(lo) > p(l)p(o) so 'lo' wins; p(ab) < p(a)p(b) so
    // 'ab' splits — Viterbi semantics pinned independently of training
    val m = Unigram.Model(Seq("l" -> -3.0, "o" -> -3.0, "x" -> -3.0,
      "a" -> -3.0, "b" -> -3.0, "lo" -> -1.0, "ab" -> -8.0))
    val enc = Unigram.encode(
      Seq((1L, "lo lox ab")).toDF("id", "text"), "id", "text", m)
      .collect()(0).getSeq[String](1)
    assert(enc == Seq("lo", "lo", "x", "a", "b"),
      s"max-likelihood segmentation: $enc")
  }

  test("fixture smoke: trains on real documents, pieces cover the vocab") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = Unigram.train(Bpe.wordCounts(docs, "text"), vocabSize = 120,
      seedSize = 400, maxPieceLen = 6)
    assert(m.pieces.length <= 120 + 40, // chars can push past target
      s"vocab ${m.pieces.length}")
    assert(m.pieces.exists(_._1.length > 1),
      "a real corpus must yield multi-char pieces")
    val probs = m.pieces.map(p => math.exp(p._2)).sum
    assert(math.abs(probs - 1.0) < 1e-6, s"probabilities sum to 1: $probs")
  }
}
