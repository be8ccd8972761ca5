package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary pipeline: schema, batch shape, deterministic stub features") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val items = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractFeatures(items, batchHint = 4).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3)) // histogram sums to 1
    // deterministic: running twice gives identical checksums
    val again = Multimodal.extractFeatures(items, batchHint = 4).collect()
    assert(feats.sortBy(_.id).map(_.checksum).toSeq ==
      again.sortBy(_.id).map(_.checksum).toSeq)
    // n_bytes matches payload length
    val lens = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).getBytes("UTF-8").length.toLong).toMap
    assert(feats.forall(f => f.n_bytes == lens(f.id)))
  }

  test("resize pools features to the target dimension, preserving mass") {
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val items = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val resized = Multimodal.resize(Multimodal.extractFeatures(items), 4).collect()
    assert(resized.forall(_.features.length == 4))
    assert(resized.forall(f => math.abs(f.features.map(_ * 4).sum - 1.0f) < 1e-2))
  }

  test("PPM payloads take the REAL decode path: pooled luminance grid") {
    import graft.operators.Multimodal.Codecs
    // 8x8 P6: top half pure black, bottom half pure white
    def ppm(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val raster = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        val o = (y * w + x) * 3
        raster(o) = r.toByte; raster(o + 1) = g.toByte; raster(o + 2) = b.toByte
      }
      header ++ raster
    }
    val img = ppm(8, 8)((_, y) => if (y < 4) (0, 0, 0) else (255, 255, 255))
    val f = Codecs.decodeImage(img)
    assert(f.length == 16)
    // top two grid rows black (0), bottom two white (~1)
    assert(f.take(8).forall(_ == 0f), f.toSeq)
    assert(f.drop(8).forall(v => math.abs(v - 1f) < 1e-4), f.toSeq)
    // header niceties: comments and odd whitespace still parse
    val commented = ("P6 # a comment\n# another\n 8\t8 \n255\n".getBytes("US-ASCII")
      ++ img.drop(s"P6\n8 8\n255\n".length))
    assert(Codecs.decodePpm(commented).exists { case (w, h, _) => w == 8 && h == 8 })
    // corruption falls back to the histogram path rather than failing:
    // truncated raster, wrong magic, non-255 maxval
    assert(Codecs.decodePpm(img.dropRight(1)).isEmpty)
    assert(Codecs.decodePpm("P5\n8 8\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Codecs.decodePpm("P6\n8 8\n65535\n".getBytes("US-ASCII")).isEmpty)
    val fallback = Codecs.decodeImage(img.dropRight(1))
    assert(math.abs(fallback.sum - 1f) < 1e-3) // histogram semantics
    // end-to-end through the distributed pipeline
    import spark.implicits._
    val items = Seq((1L, img, "ppm"), (2L, img.dropRight(1), "ppm"))
      .toDF("id", "media", "format").as[Multimodal.MediaItem]
    val feats = Multimodal.extractFeatures(items).collect()
      .map(x => x.id -> x.features).toMap
    assert(feats(1L).toSeq == f.toSeq)
    assert(feats(2L).toSeq == fallback.toSeq)
  }

  test("PNG payloads take the REAL decode path, all five filters") {
    import graft.operators.Multimodal.Codecs
    val crc = new java.util.zip.CRC32
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      val body = typ.getBytes("US-ASCII") ++ data
      crc.reset(); crc.update(body)
      be32(data.length.toLong) ++ body ++ be32(crc.getValue)
    }
    // Encode `pixels` (h rows of w samples, bpp channels) as a PNG whose
    // row y uses filter y % 5 — the decoder must invert every filter type.
    def png(w: Int, h: Int, colorType: Int, samples: Array[Int]): Array[Byte] = {
      val bpp = colorType match { case 0 => 1; case 4 => 2; case 2 => 3; case _ => 4 }
      val stride = w * bpp
      val raw = new Array[Byte]((stride + 1) * h)
      for (y <- 0 until h) {
        val f = y % 5
        raw(y * (stride + 1)) = f.toByte
        for (x <- 0 until stride) {
          val cur = samples(y * stride + x)
          val a = if (x >= bpp) samples(y * stride + x - bpp) else 0
          val b = if (y > 0) samples((y - 1) * stride + x) else 0
          val c = if (x >= bpp && y > 0) samples((y - 1) * stride + x - bpp) else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case _ =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        }
      }
      val deflated = {
        val d = new java.util.zip.Deflater
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
      val ihdr = Array(
        (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
        (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
        8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
        chunk("IEND", Array.empty[Byte])
    }
    // 8x8 RGB with a value pattern that makes every filter's delta nonzero
    val w = 8; val h = 8
    val rgbSamples = Array.tabulate(h * w * 3)(i => (i * 37 + (i / 24) * 11) % 256)
    val bytes = png(w, h, 2, rgbSamples)
    val decoded = Codecs.decodePng(bytes)
    assert(decoded.isDefined, "well-formed RGB PNG must decode")
    val (dw, dh, rgb) = decoded.get
    assert(dw == w && dh == h)
    assert(rgb.map(_ & 0xff).toSeq == rgbSamples.toSeq)
    // same pixels through PPM → identical luminance-grid features: the
    // shared 4x4 contract between the two real decoders
    val ppm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    assert(Codecs.decodeImage(bytes).toSeq == Codecs.decodeImage(ppm).toSeq)
    // grayscale replicates to RGB; RGBA drops alpha to the same RGB
    val graySamples = Array.tabulate(h * w)(i => (i * 53) % 256)
    val gray = Codecs.decodePng(png(w, h, 0, graySamples))
    assert(gray.exists(_._3.map(_ & 0xff).toSeq ==
      graySamples.flatMap(g => Seq(g, g, g)).toSeq))
    val rgbaSamples = Array.tabulate(h * w * 4) { i =>
      if (i % 4 == 3) 255 - i % 200 else rgbSamples(i / 4 * 3 + i % 4)
    }
    assert(Codecs.decodePng(png(w, h, 6, rgbaSamples))
      .exists(_._3.toSeq == rgb.toSeq))
    // corruption → None → decodeImage falls back to the histogram
    assert(Codecs.decodePng(bytes.dropRight(30)).isEmpty) // truncated IDAT
    assert(Codecs.decodePng("notapng_at_all_padding_padding".getBytes).isEmpty)
    val interlaced = bytes.clone; interlaced(8 + 4 + 4 + 12) = 1 // IHDR interlace=1
    assert(Codecs.decodePng(interlaced).isEmpty)
    assert(math.abs(Codecs.decodeImage(bytes.dropRight(30)).sum - 1f) < 1e-3)
    // dispatch: decodeMedia routes PNG through the image path
    assert(Codecs.decodeMedia(bytes).toSeq == Codecs.decodeImage(ppm).toSeq)
  }

  test("JPEG payloads take the REAL decode path via the JDK codec") {
    import graft.operators.Multimodal.Codecs
    import java.awt.image.BufferedImage
    // smooth gradient: JPEG is lossy but preserves low-frequency content,
    // so the pooled 4x4 luminance grid must track the lossless PPM of the
    // same pixels within a tight tolerance
    val w = 32; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 8) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK must ship a JPEG writer")
    val bytes = bos.toByteArray
    val decoded = Codecs.decodeJpeg(bytes)
    assert(decoded.isDefined, "well-formed JPEG must decode")
    val (dw, dh, _) = decoded.get
    assert(dw == w && dh == h)
    val rgbExact = (0 until h).flatMap(y => (0 until w).flatMap { x =>
      val p = img.getRGB(x, y)
      Seq(((p >> 16) & 0xff).toByte, ((p >> 8) & 0xff).toByte, (p & 0xff).toByte)
    }).toArray
    val ppm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgbExact
    val gJpeg = Codecs.decodeImage(bytes)
    val gExact = Codecs.decodeImage(ppm)
    (gJpeg zip gExact).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.02f, s"grid cell drifted: $a vs $b")
    }
    // dispatch: decodeMedia routes JPEG through the image path
    assert(Codecs.decodeMedia(bytes).toSeq == gJpeg.toSeq)
    // corruption is contained: truncated stream and SOI-magic garbage
    // return None (histogram fallback), never a task failure
    assert(Codecs.decodeJpeg(bytes.take(60)).isEmpty)
    assert(Codecs.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array.fill(64)(0x55.toByte)).isEmpty)
    assert(Codecs.decodeJpeg("not a jpeg".getBytes).isEmpty)
  }

  test("adversarial headers: overflow chunk lengths and giant dims return None, never throw") {
    import graft.operators.Multimodal.Codecs
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def le32(v: Long): Array[Byte] = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    // PNG chunk length 0x7ffffff8: the Int sum o + 12 + len wraps negative,
    // so an Int bounds check admits it and idat.write throws outside the
    // decoder's try — the Long bounds math must reject it as malformed
    val evilChunk = sig ++ be32(0x7ffffff8L) ++ "IDAT".getBytes("US-ASCII") ++
      Array.fill(32)(0.toByte)
    assert(Codecs.decodePng(evilChunk).isEmpty)
    // 40000x30000 grayscale: the filtered-raw length (~1.2 GB) squeaks
    // under Int.MaxValue so the old guard allocated it from a 60-byte
    // payload (and the rgb projection w*h*3 would then wrap negative) —
    // the pixel cap must reject on the header alone
    val giantIhdr = be32(40000L) ++ be32(30000L) ++
      Array[Byte](8, 0, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ data
      crc.reset(); crc.update(body)
      be32(data.length.toLong) ++ body ++ be32(crc.getValue)
    }
    val giant = sig ++ chunk("IHDR", giantIhdr) ++
      chunk("IDAT", Array[Byte](1, 2, 3)) ++ chunk("IEND", Array.empty[Byte])
    assert(Codecs.decodePng(giant).isEmpty)
    // WAV data-chunk length 0x7ffffff0: same Int-wrap admission, then a
    // 2 GB Array[Short] allocation driven by a 44-byte payload
    val evilWav = "RIFF".getBytes("US-ASCII") ++ le32(36L) ++
      "WAVE".getBytes("US-ASCII") ++ "data".getBytes("US-ASCII") ++
      le32(0x7ffffff0L) ++ Array.fill(24)(0.toByte)
    assert(Codecs.decodeWav(evilWav).isEmpty)
    // JPEG bomb: a real tiny JPEG whose SOF frame header is patched to
    // declare 40000x40000 (1.6e9 px). The decoder must reject on the
    // parsed header (reader.getWidth/getHeight) BEFORE reader.read — a
    // post-decode check lets the JDK codec allocate a multi-GB raster
    // whose OutOfMemoryError escapes an Exception catch and kills the
    // task. Rejection here proves the cap runs pre-allocation.
    val tinyImg = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val tinyBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(tinyImg, "jpg", tinyBos))
    val bomb = tinyBos.toByteArray
    // locate SOF0/SOF2 (ff c0 / ff c2): marker, len(2), precision(1),
    // then height(2) and width(2) big-endian — patch both to 40000
    var sof = -1
    var k = 2
    while (sof < 0 && k + 9 < bomb.length) {
      if ((bomb(k) & 0xff) == 0xff &&
          ((bomb(k + 1) & 0xff) == 0xc0 || (bomb(k + 1) & 0xff) == 0xc2)) sof = k
      k += 1
    }
    assert(sof > 0, "JDK-written JPEG must carry a SOF marker")
    bomb(sof + 5) = ((40000 >> 8) & 0xff).toByte; bomb(sof + 6) = (40000 & 0xff).toByte
    bomb(sof + 7) = ((40000 >> 8) & 0xff).toByte; bomb(sof + 8) = (40000 & 0xff).toByte
    assert(Codecs.decodeJpeg(bomb).isEmpty,
      "giant-dim JPEG header must be rejected before decode")
    // all four still take the histogram fallback cleanly end-to-end
    assert(math.abs(Codecs.decodeMedia(evilChunk).sum - 1f) < 1e-3)
    assert(math.abs(Codecs.decodeMedia(evilWav).sum - 1f) < 1e-3)
    assert(math.abs(Codecs.decodeMedia(bomb).sum - 1f) < 1e-3)
  }

  test("WAV payloads take the REAL audio path: per-window RMS energy") {
    import graft.operators.Multimodal.Codecs
    // 16-bit PCM mono: first half silence, second half full-scale square
    val frames = 1600
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val pcm: Array[Byte] = (0 until frames).flatMap { i =>
      le16(if (i < frames / 2) 0 else if (i % 2 == 0) 32767 else -32768)
    }.toArray
    val wav: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + pcm.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(pcm.length) ++ pcm
    val f = Codecs.decodeAudio(wav)
    assert(f.isDefined, "well-formed WAV must decode")
    val feats = f.get
    assert(feats.length == 16)
    // first 8 windows silent, last 8 at (near-)full-scale RMS
    assert(feats.take(8).forall(_ == 0f), feats.toSeq)
    assert(feats.drop(8).forall(v => math.abs(v - 1f) < 1e-2), feats.toSeq)
    // corruption → None → extractFeatures falls back to the histogram
    assert(Codecs.decodeWav(wav.dropRight(1)).isEmpty)
    assert(Codecs.decodeWav("RIFX1234WAVE".getBytes).isEmpty)
    // dispatch: decodeMedia routes WAV to audio, PPM to image, rest to histogram
    assert(Codecs.decodeMedia(wav).toSeq == feats.toSeq)
    assert(math.abs(Codecs.decodeMedia("not media at all".getBytes).sum - 1f) < 1e-3)
  }

  test("frameSample emits n bounded frames per item") {
    val docs = Tables.load(spark, sfDir, "documents").limit(10)
    val items = Multimodal.asMedia(docs, "doc_id", "text", "video/fake")
    val frames = Multimodal.frameSample(items, n = 3, frameBytes = 16).collect()
    assert(frames.length == 30)
    assert(frames.forall(_.payload.length <= 16))
    assert(frames.groupBy(_.id).forall(_._2.map(_.frame).sorted.toSeq == Seq(0, 1, 2)))
  }

  private def synthRgb(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val raster = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val o = (y * w + x) * 3
      raster(o) = r.toByte; raster(o + 1) = g.toByte; raster(o + 2) = b.toByte
    }
    raster
  }

  private def basePx(seed: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((seed * 7919 + x * 31 + y * 17) % 200).toInt,
    ((seed * 104729 + x * 13 + y * 29) % 200).toInt,
    ((seed * 1299709 + x * 37 + y * 11) % 200).toInt)

  test("encodePpm is the exact inverse of decodePpm") {
    import graft.operators.Multimodal.Codecs
    val rgb = synthRgb(36, 32)(basePx(5))
    val Some((w, h, back)) = Codecs.decodePpm(Codecs.encodePpm(36, 32, rgb))
    assert(w == 36 && h == 32 && java.util.Arrays.equals(back, rgb),
      "P6 is lossless 8-bit RGB: encode then decode must be the identity")
  }

  test("dHash: brightness-shift invariant, local edits flip at most their cell's bit") {
    import graft.operators.Multimodal.Codecs
    def hash(px: (Int, Int) => (Int, Int, Int)): Seq[Int] =
      Codecs.dhashBands(Codecs.encodePpm(36, 32, synthRgb(36, 32)(px))).get.toSeq
    val base = hash(basePx(3))
    // +40 on every channel (no clamp: base < 200): every cell sum moves
    // by the same constant, so every comparison — and the hash — is fixed
    val bright = hash((x, y) => {
      val (r, g, b) = basePx(3)(x, y); (r + 40, g + 40, b + 40) })
    assert(bright == base, "dHash must be invariant to uniform brightness")
    // +50 red over the top-left 4×4 cell: only comparison k=0 touches
    // that cell, so Hamming distance is at most 1
    val edited = hash((x, y) => {
      val (r, g, b) = basePx(3)(x, y)
      (if (x < 4 && y < 4) r + 50 else r, g, b) })
    val dist = base.zip(edited)
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(dist <= 1, s"a one-cell edit must flip at most one bit: $dist")
    // an unrelated image is far: the banded join's precision story
    assert(base.zip(hash(basePx(4)))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum > 3)
  }

  test("nearDupPairs == brute-force Hamming (exact recall by pigeonhole); non-images dropped") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.Codecs
    import spark.implicits._
    // 10 groups × 3 variants, same shape as the declared mm_dedup query
    val items = (0L until 30L).map { j =>
      val seed = j / 3
      val v = j % 3
      val rgb = synthRgb(36, 32)((x, y) => {
        val (r, g, b) = basePx(seed)(x, y)
        (if (v == 2 && x < 4 && y < 4) r + 50 else if (v == 1) r + 40 else r,
          if (v == 1) g + 40 else g, if (v == 1) b + 40 else b) })
      Multimodal.MediaItem(j, Codecs.encodePpm(36, 32, rgb), "ppm")
    } :+ Multimodal.MediaItem(99L, "not an image".getBytes, "bin")
    val hashes = Multimodal.dhash(items.toDS())
    assert(hashes.count() == 30, "non-decodable payloads must be dropped")

    val got = Multimodal.nearDupPairs(hashes.toDF(), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force over the collected hashes — the ground truth the
    // banded join must reproduce EXACTLY (≤3 differing bits cannot
    // touch all 4 bands)
    val hs = hashes.collect()
    val want = (for {
      a <- hs; b <- hs if a.id < b.id
      d = Integer.bitCount(a.b0 ^ b.b0) + Integer.bitCount(a.b1 ^ b.b1) +
        Integer.bitCount(a.b2 ^ b.b2) + Integer.bitCount(a.b3 ^ b.b3)
      if d <= 3
    } yield (a.id, b.id)).toSet
    assert(got == want && want.size >= 30,
      s"banded recall must be exact: got ${got.size}, want ${want.size}")
    assert(Multimodal.nearDupPairs(hashes.toDF(), maxHamming = 0)
      .count() >= 10, "each group's base/bright pair hashes identically")
    intercept[IllegalArgumentException] {
      Multimodal.nearDupPairs(hashes.toDF(), maxHamming = 4)
    }
  }

  test("audio fingerprint: WAV round-trip; pitch/volume invariant; local edit ≤ 1 bit; non-audio dropped") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.Codecs
    import spark.implicits._
    // a clip = amplitude envelope over 65 windows × 64 frames; variants
    // mirror the declared mm_audio_dedup fixture
    def clip(seed: Long, variant: Long): Array[Byte] = {
      val half = if (variant == 1) 2 else 4
      val samples = new Array[Short](65 * 64)
      var i = 0
      while (i < samples.length) {
        val w = i / 64
        var a = (seed * 7919L + w * 104729L + seed * w * 337L) % 6000L + 2000L
        if (variant == 3 && w == 0) a += 3000L
        if (variant == 2) a *= 2L
        samples(i) = (if ((i / half) % 2 == 0) a else -a).toShort
        i += 1
      }
      Codecs.encodeWav(8000, 1, samples)
    }
    // encode∘decode is the identity on samples (16-bit PCM is lossless)
    val enc = clip(3, 0)
    val dec = Codecs.decodeWav(enc)
    assert(dec.isDefined && dec.get._1 == 8000 && dec.get._2 == 1)
    assert(dec.get._3.length == 65 * 64)
    assert(Codecs.decodeWav(enc).get._3.toSeq ==
      Codecs.decodeWav(Codecs.encodeWav(8000, 1, dec.get._3)).get._3.toSeq)

    def ham(x: Array[Int], y: Array[Int]): Int =
      x.zip(y).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    val base = Codecs.audioBands(clip(5, 0)).get
    // pitch shift: every SAMPLE differs, every window energy is equal
    assert(!clip(5, 1).sameElements(clip(5, 0)))
    assert(ham(base, Codecs.audioBands(clip(5, 1)).get) == 0,
      "an energy-profile-preserving pitch shift must not move the hash")
    // volume shift: energies scale uniformly — comparisons invariant
    assert(ham(base, Codecs.audioBands(clip(5, 2)).get) == 0,
      "a uniform volume change must not move the hash")
    // a local edit touches one window — at most its one comparison flips
    assert(ham(base, Codecs.audioBands(clip(5, 3)).get) <= 1)
    // different seeds are far apart
    assert(ham(base, Codecs.audioBands(clip(6, 0)).get) > 3)
    // malformed audio is dropped, never pseudo-hashed
    assert(Codecs.audioBands("RIFF????WAVEnope".getBytes).isEmpty)
    assert(Codecs.audioBands(enc.dropRight(1)).isEmpty)

    // end to end through the banded join: planted pairs recovered
    // exactly, non-audio payloads dropped
    val items = (0L until 12L).map(j =>
      Multimodal.MediaItem(j, clip(j / 4, j % 4), "wav")) :+
      Multimodal.MediaItem(99L, "not audio".getBytes, "bin")
    val hashes = Multimodal.audioHash(items.toDS())
    assert(hashes.count() == 12, "non-decodable payloads must be dropped")
    val got = Multimodal.nearDupPairs(hashes.toDF(), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      g <- 0L until 3L; a <- 0L until 4L; b <- (a + 1) until 4L
    } yield (g * 4 + a, g * 4 + b)).toSet
    assert(got == want, s"planted audio pairs must be recovered exactly: $got")
  }
}
