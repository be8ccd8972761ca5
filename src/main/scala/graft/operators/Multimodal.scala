package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and per-item decode /
  * feature-extraction runs batched inside `mapPartitions` so a real codec
  * drops in without touching the distributed plan.
  *
  * [[Codecs.decodeImage]] REALLY decodes binary P6 PPM, PNG and JPEG
  * images into a pooled-luminance feature grid — PPM/PNG via pure-JVM
  * parsers (`java.util.zip.Inflater` + the five scanline filters), JPEG
  * via the JDK's own `javax.imageio` codec (`java.desktop`, present in
  * every standard JDK; no external library). Payloads in any other
  * format fall back to a deterministic byte histogram — the documented
  * stand-in for codecs no JDK ships (video). Schema, batch shape,
  * partition sizing, and feature columns are identical on all paths.
  */
object Multimodal {

  /** Typed media row: id + raw payload + metadata. */
  final case class MediaItem(id: Long, media: Array[Byte], format: String)

  /** Fixed-width feature record produced by the extract stage. */
  final case class MediaFeatures(
      id: Long, format: String, n_bytes: Long,
      checksum: Long, features: Array[Float])

  object Codecs {
    /** Upper bound on decoded pixels (4096×4096): header-declared
      * dimensions are untrusted input, and allocation happens before any
      * raster bytes are validated, so the cap must precede the alloc.
      */
    val MaxDecodePixels: Long = 1L << 24

    /** Pure-JVM P6 (binary) PPM parser: returns (width, height, packed
      * RGB bytes), or None when the payload is not a well-formed
      * 8-bit-per-channel P6 image (wrong magic, truncated raster,
      * non-255 maxval). Handles `#` comments and arbitrary whitespace in
      * the header per the netpbm spec.
      */
    def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
      var i = 2
      def skipWs(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          val c = bytes(i)
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        val s = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        if (i > s && i - s <= 9) new String(bytes, s, i - s, "US-ASCII").toInt
        else -1
      }
      val w = int(); val h = int(); val mx = int()
      // exactly one whitespace byte separates the header from the raster
      if (w <= 0 || h <= 0 || mx != 255 || i >= bytes.length) return None
      i += 1
      val need = w.toLong * h * 3
      if (need > Int.MaxValue || i + need > bytes.length) None
      else Some((w, h, java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
    }

    /** Pure-JVM PNG decoder: returns (width, height, packed RGB bytes),
      * or None for anything that isn't an 8-bit-depth, non-interlaced
      * grayscale / gray+alpha / RGB / RGBA PNG (palette images and 16-bit
      * channels are rejected up front; alpha is dropped, gray is
      * replicated to RGB). The whole format is chunk walk + zlib
      * (`java.util.zip.Inflater`) + the five scanline filters (None /
      * Sub / Up / Average / Paeth) — no codec library needed. Malformed
      * input (bad CRC structure, truncated IDAT, wrong filter byte)
      * returns None rather than throwing, matching [[decodePpm]].
      */
    def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (bytes.length < 8 + 25) return None
      var s = 0
      while (s < 8) { if (bytes(s) != sig(s)) return None; s += 1 }
      def u32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      var o = 8
      var w = 0; var h = 0; var colorType = -1
      var headerOk = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && o + 12 <= bytes.length) {
        // bounds math in Long: a chunk length near 2^31 would overflow an
        // Int sum to negative and sail past the check, turning a malformed
        // payload into an IndexOutOfBounds task failure instead of None
        val lenL = u32(o)
        if (o.toLong + 12L + lenL > bytes.length) return None
        val len = lenL.toInt
        val typ = new String(bytes, o + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = u32(o + 8).toInt; h = u32(o + 12).toInt
            val bitDepth = bytes(o + 16) & 0xff
            colorType = bytes(o + 17) & 0xff
            headerOk = w > 0 && h > 0 && bitDepth == 8 &&
              (colorType == 0 || colorType == 2 || colorType == 4 || colorType == 6) &&
              bytes(o + 18) == 0 && bytes(o + 19) == 0 && bytes(o + 20) == 0
            if (!headerOk) return None
          case "IDAT" => idat.write(bytes, o + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        o += 12 + len
      }
      if (!headerOk || idat.size == 0) return None
      // Cap decoded size BEFORE allocating: header dimensions are
      // attacker-controlled, and without this a 33-byte payload declaring
      // 46000×46000 demands multi-GB buffers across 32 concurrent tasks.
      // 2^24 px (= 4096×4096 RGBA ≈ 67 MB raw) is plenty for a pipeline
      // that pools to a 4×4 luminance grid.
      if (w.toLong * h > MaxDecodePixels) return None
      val bpp = colorType match { case 0 => 1; case 4 => 2; case 2 => 3; case _ => 4 }
      val stride = w * bpp // safe: w*h ≤ 2^24 bounds w ≤ 2^24, bpp ≤ 4
      val rawLen = (stride + 1).toLong * h
      if (rawLen > Int.MaxValue) return None
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      try {
        var got = 0
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          if (n == 0 && inf.needsInput()) return None // truncated stream
          got += n
        }
        if (got < raw.length) return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
      // unfilter scanline by scanline; `img` holds reconstructed samples
      val img = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        if (f > 4) return None
        val rowOff = y * (stride + 1) + 1
        val outOff = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowOff + x) & 0xff
          val a = if (x >= bpp) img(outOff + x - bpp) & 0xff else 0 // left
          val b = if (y > 0) img(outOff - stride + x) & 0xff else 0 // up
          val c = if (x >= bpp && y > 0) img(outOff - stride + x - bpp) & 0xff else 0
          val v = f match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + b
            case 3 => cur + (a + b) / 2
            case _ => // Paeth
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          }
          img(outOff + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      // project to the packed-RGB contract shared with decodePpm
      val rgb = new Array[Byte](w * h * 3)
      var px = 0
      val n = w * h
      while (px < n) {
        val src = px * bpp
        if (bpp <= 2) {
          val g = img(src)
          rgb(3 * px) = g; rgb(3 * px + 1) = g; rgb(3 * px + 2) = g
        } else {
          rgb(3 * px) = img(src); rgb(3 * px + 1) = img(src + 1)
          rgb(3 * px + 2) = img(src + 2)
        }
        px += 1
      }
      Some((w, h, rgb))
    }

    /** JPEG decode via the JDK's own codec (`javax.imageio`, in the
      * `java.desktop` module every standard JDK ships — no external
      * library): returns (width, height, packed RGB bytes) matching the
      * [[decodePpm]]/[[decodePng]] contract. Baseline and progressive
      * JPEG both decode; exotic color spaces the JDK reader rejects
      * (e.g. Adobe CMYK) and corrupt/truncated streams return None —
      * `ImageIO.read` failures are contained here, never task failures.
      * The stream cache is disabled once, process-wide: the default
      * file-backed cache would touch local disk for every image on every
      * executor.
      */
    def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      // SOI magic: ff d8 — anything else isn't JPEG, skip the codec
      if (bytes.length < 3 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
        return None
      try {
        javax.imageio.ImageIO.setUseCache(false)
        // Same cap-BEFORE-alloc discipline as decodePng: the SOF frame
        // header declares dimensions, and reader.getWidth/getHeight parse
        // only that header — no raster allocation. A 200-byte payload
        // declaring 40000×40000 must be rejected here; letting the codec
        // decode first would allocate a multi-GB raster whose OOM Error
        // escapes any Exception catch and kills the executor.
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0); val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
            val img = reader.read(0)
            if (img == null) return None
            packRgb(img, w, h)
          } finally reader.dispose()
        } finally iis.close()
      } catch {
        // Throwable, not Exception: a codec bug or a raster the header
        // cap could not predict surfaces as an Error; decode failures are
        // contained here by contract — never task failures.
        case t: Throwable if !t.isInstanceOf[InterruptedException] => None
      }
    }

    /** Project a decoded BufferedImage onto the packed-RGB contract shared
      * with [[decodePpm]]/[[decodePng]]. Caller has already capped w*h.
      */
    private def packRgb(img: java.awt.image.BufferedImage, w: Int, h: Int)
        : Option[(Int, Int, Array[Byte])] = {
      val rgb = new Array[Byte](w * h * 3)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          val o = (y * w + x) * 3
          rgb(o) = ((p >> 16) & 0xff).toByte
          rgb(o + 1) = ((p >> 8) & 0xff).toByte
          rgb(o + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, rgb))
    }

    /** Decode any payload into a 16-float feature vector by magic-number
      * sniffing: P6 PPM / PNG / JPEG → pooled-luminance grid, RIFF/WAVE
      * 16-bit PCM → per-window RMS energy, anything else → the histogram
      * fallback.
      */
    def decodeMedia(bytes: Array[Byte]): Array[Float] =
      decodeAudio(bytes).getOrElse(decodeImage(bytes))

    /** Decode a payload into a 16-float feature vector. P6 PPM, PNG and
      * JPEG payloads take the REAL path: per-pixel Rec.601 luminance
      * average-pooled onto a 4×4 grid in [0, 1] (the thumbnail-embedding
      * shape). Other formats fall back to a deterministic byte histogram
      * so the pipeline stays runnable where no codec exists (video
      * container formats remain in that bucket — the JDK ships no video
      * codec and this sandbox can add none).
      */
    def decodeImage(bytes: Array[Byte]): Array[Float] =
      decodePpm(bytes).orElse(decodePng(bytes)).orElse(decodeJpeg(bytes)) match {
      case Some((w, h, rgb)) =>
        val out = new Array[Float](16)
        val cnt = new Array[Int](16)
        var p = 0
        val n = w * h
        while (p < n) {
          val gx = (p % w) * 4 / w
          val gy = (p / w) * 4 / h
          val lum = (0.299f * (rgb(3 * p) & 0xff) +
            0.587f * (rgb(3 * p + 1) & 0xff) +
            0.114f * (rgb(3 * p + 2) & 0xff)) / 255f
          out(gy * 4 + gx) += lum
          cnt(gy * 4 + gx) += 1
          p += 1
        }
        var j = 0
        while (j < 16) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
        out
      case None =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % 16) += 1f; i += 1 }
        if (bytes.length > 0) { var j = 0; while (j < 16) { hist(j) /= bytes.length; j += 1 } }
        hist
    }

    /** Pure-JVM RIFF/WAVE parser for 16-bit PCM: returns (sampleRate,
      * channels, interleaved samples), or None for anything that isn't a
      * well-formed 16-bit PCM WAV (other magic, compressed formats,
      * truncated data chunk). Walks the chunk list, so extra chunks
      * (LIST, fact, …) before `data` are fine.
      */
    def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      def u32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def tag(o: Int): String =
        if (o + 4 <= bytes.length) new String(bytes, o, 4, "US-ASCII") else ""
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var (fmtOk, channels, rate) = (false, 0, 0)
      var samples: Array[Short] = null
      var o = 12
      while (o + 8 <= bytes.length && (samples == null || !fmtOk)) {
        val id = tag(o)
        // Long bounds math, same reasoning as decodePng's chunk walk
        val lenL = u32(o + 4)
        if (o.toLong + 8L + lenL > bytes.length) return None
        val len = lenL.toInt
        if (id == "fmt " && len >= 16) {
          fmtOk = u16(o + 8) == 1 && u16(o + 22) == 16 // PCM, 16-bit
          channels = u16(o + 10)
          rate = u32(o + 12).toInt
        } else if (id == "data") {
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = ((bytes(o + 8 + 2 * i) & 0xff) |
              (bytes(o + 9 + 2 * i) << 8)).toShort
            i += 1
          }
        }
        o += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (fmtOk && channels > 0 && samples != null) Some((rate, channels, samples))
      else None
    }

    /** REAL audio features from a 16-bit PCM WAV: per-window RMS energy
      * over 16 equal time windows, channels averaged, samples normalized
      * to [−1, 1] — the clip-level energy profile shape.
      */
    def decodeAudio(bytes: Array[Byte]): Option[Array[Float]] =
      decodeWav(bytes).map { case (_, channels, pcm) =>
        val frames = pcm.length / channels
        val out = new Array[Float](16)
        val cnt = new Array[Int](16)
        var f = 0
        while (f < frames) {
          var s = 0.0f
          var c = 0
          while (c < channels) { s += pcm(f * channels + c) / 32768.0f; c += 1 }
          val v = s / channels
          val w = if (frames == 0) 0 else math.min(f * 16 / frames, 15)
          out(w) += v * v
          cnt(w) += 1
          f += 1
        }
        var j = 0
        while (j < 16) {
          if (cnt(j) > 0) out(j) = math.sqrt(out(j) / cnt(j)).toFloat
          j += 1
        }
        out
      }

    /** Real RIFF/WAVE encoder for 16-bit PCM — the inverse of
      * [[decodeWav]] (16-bit PCM is lossless on samples, so
      * encode∘decode is the identity, which is what lets a generated-
      * audio oracle replay the fingerprint path as pure integer
      * arithmetic — the [[encodePpm]] argument for images).
      */
    def encodeWav(rate: Int, channels: Int,
        samples: Array[Short]): Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"${samples.length} samples do not tile $channels channels")
      val data = samples.length * 2
      val out = new Array[Byte](44 + data)
      def le16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def le32(o: Int, v: Int): Unit = {
        le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff)
      }
      def tag(o: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, o, 4)
      }
      tag(0, "RIFF"); le32(4, 36 + data); tag(8, "WAVE")
      tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
      le32(24, rate); le32(28, rate * channels * 2); le16(32, channels * 2)
      le16(34, 16)
      tag(36, "data"); le32(40, data)
      var i = 0
      while (i < samples.length) { le16(44 + 2 * i, samples(i) & 0xffff); i += 1 }
      out
    }

    /** Banded audio fingerprint of a 16-bit PCM WAV, as four 16-bit
      * bands — the audio twin of [[dhashBands]].
      *
      * The clip splits into 65 equal time windows; per window the
      * INTEGER energy sum S_w = Σ (Σ_channels s)² and frame count C_w
      * accumulate, and bit k (k = 0…63) compares adjacent windows
      * cross-multiplied: S_k·C_{k+1} < S_{k+1}·C_k — the [[dhashBands]]
      * recipe with time windows for cells and energy for luma, integer
      * end to end so any SQL engine replays it bit-exactly. Invariances
      * mirror dHash's brightness argument: a volume change scales every
      * window's energy by the same factor, so all comparisons — and the
      * hash — are EXACT-invariant; a pitch change that preserves the
      * amplitude envelope (the energy profile) leaves S_w untouched;
      * a local edit flips only the comparisons its windows join. Bit
      * k lives in band k/16 at position k%16; Hamming distance over the
      * four bands measures profile difference, and banding gives exact
      * recall for distance < 4 (pigeonhole — the [[nearDupPairs]]
      * argument, which this feeds via [[audioHash]]). Comparisons go
      * through BigInt: S_w can reach frames·(32768·channels)² on
      * pathological input, and the cross-product must not overflow.
      */
    def audioBands(bytes: Array[Byte]): Option[Array[Int]] =
      decodeWav(bytes).map { case (_, channels, pcm) =>
        val frames = pcm.length / channels
        val s = new Array[Long](65)
        val c = new Array[Long](65)
        var f = 0
        while (f < frames) {
          var v = 0L
          var ch = 0
          while (ch < channels) { v += pcm(f * channels + ch); ch += 1 }
          val w = math.min((f.toLong * 65 / frames).toInt, 64)
          s(w) += v * v
          c(w) += 1
          f += 1
        }
        val bands = new Array[Int](4)
        var k = 0
        while (k < 64) {
          if (BigInt(s(k)) * c(k + 1) < BigInt(s(k + 1)) * c(k))
            bands(k / 16) |= 1 << (k % 16)
          k += 1
        }
        bands
      }

    def checksum(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }

    /** Real P6 PPM encoder — the inverse of [[decodePpm]] (P6 is
      * lossless 8-bit RGB, so encode∘decode is the identity on pixels,
      * which is what lets a generated-image oracle replay the decode
      * path as pure integer arithmetic).
      */
    def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"raster ${rgb.length} != $w x $h x 3")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Difference hash (dHash) of a decoded image, as four 16-bit bands.
      *
      * The classic perceptual hash (public recipe: pool to a 9×8
      * luminance grid, emit one bit per horizontally adjacent cell pair
      * — 8 rows × 8 comparisons = 64 bits), kept in INTEGER arithmetic
      * end to end so the hash is bit-exact replayable by any SQL engine:
      * per-pixel luma = 299·R + 587·G + 114·B (Rec.601 scaled by 1000,
      * no division), per-cell SUM + COUNT, and the comparison
      * cross-multiplied (sL·cR < sR·cL) so unequal cell populations
      * never need a float. Bit k = gy·8+gx lives in band k/16 at
      * position k%16 — four non-negative 16-bit ints instead of one
      * signed 64-bit word, which keeps every downstream xor/bit_count/
      * band-extract free of sign pitfalls in both engines.
      *
      * Why dHash for near-dup: a uniform brightness shift adds the same
      * constant to every cell sum, so all comparisons — and the hash —
      * are INVARIANT; re-encodes are identity (P6) or lossless (PNG);
      * small local edits flip only the few bits whose cells they touch.
      * Hamming distance therefore measures perceptual difference, and
      * banding gives exact recall for distance < 4 (pigeonhole over the
      * 4 bands, the [[graft.operators.Dedup]] SimHash argument).
      */
    def dhashBands(bytes: Array[Byte]): Option[Array[Int]] =
      decodePpm(bytes).orElse(decodePng(bytes)).orElse(decodeJpeg(bytes))
        .map { case (w, h, rgb) =>
          val s = Array.ofDim[Long](8, 9)
          val c = Array.ofDim[Long](8, 9)
          var p = 0
          val n = w * h
          while (p < n) {
            val x = p % w
            val y = p / w
            val gx = x * 9 / w
            val gy = y * 8 / h
            val lum = 299L * (rgb(3 * p) & 0xff) +
              587L * (rgb(3 * p + 1) & 0xff) + 114L * (rgb(3 * p + 2) & 0xff)
            s(gy)(gx) += lum
            c(gy)(gx) += 1
            p += 1
          }
          val bands = new Array[Int](4)
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 8) {
              val k = gy * 8 + gx
              // BigInt: sums reach 255000·2^24 on degenerate aspect
              // ratios, and the cross-product must not overflow a Long
              val bit = BigInt(s(gy)(gx)) * c(gy)(gx + 1) <
                BigInt(s(gy)(gx + 1)) * c(gy)(gx)
              if (bit) bands(k / 16) |= 1 << (k % 16)
              gx += 1
            }
            gy += 1
          }
          bands
        }
  }

  /** One image's perceptual hash: four 16-bit dHash bands. */
  final case class MediaHash(id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual-hash every decodable payload ([[Codecs.dhashBands]];
    * narrow, batched, non-images dropped — a histogram pseudo-hash would
    * make unrelated binaries collide, the wrong failure mode for dedup).
    */
  def dhash(items: Dataset[MediaItem]): Dataset[MediaHash] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap(m => Codecs.dhashBands(m.media).map(b =>
      MediaHash(m.id, b(0), b(1), b(2), b(3))))
  }

  /** Banded audio fingerprint for every decodable WAV payload
    * ([[Codecs.audioBands]]; narrow, batched, non-audio dropped — the
    * [[dhash]] argument: a histogram pseudo-hash would make unrelated
    * binaries collide, the wrong failure mode for dedup). The output
    * shape is [[MediaHash]], so [[nearDupPairs]] applies unchanged.
    */
  def audioHash(items: Dataset[MediaItem]): Dataset[MediaHash] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap(m => Codecs.audioBands(m.media).map(b =>
      MediaHash(m.id, b(0), b(1), b(2), b(3))))
  }

  /** Near-duplicate image pairs among `hashes` (columns id, b0..b3):
    * all (id_a < id_b) pairs at Hamming distance ≤ `maxHamming`, found
    * WITHOUT all-pairs — candidates must share one exact 16-bit band
    * (banded self-join, the [[Dedup.simHashPairs]] shape), then the
    * exact integer Hamming verify filters. Recall is EXACT, not
    * approximate: maxHamming < 4 differing bits cannot touch all 4
    * bands, so every true pair shares a band (pigeonhole) — which is
    * what lets the declared query oracle as brute-force Hamming in SQL.
    *
    * Scale shape: one shuffle on (band, key); candidate volume is the
    * band-collision count, not n² — hash-scattered 16-bit bands keep
    * buckets tiny except for genuinely similar populations.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"pigeonhole recall over 4 bands needs 0 <= maxHamming < 4: $maxHamming")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val bands = hashes.select(
      (col("id") +: bandCols.map(col)) :+ explode(array(
        bandCols.zipWithIndex.map { case (c, i) =>
          struct(lit(i).as("bi"), col(c).as("key")) }: _*)).as("band"): _*)
      .select(col("id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("band.bi").as("bi"), col("band.key").as("key"))
    val left = bands.select(col("bi"), col("key"), col("id").as("id_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
      col("b3").as("a3"))
    val right = bands.select(col("bi"), col("key"), col("id").as("id_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"),
      col("b3").as("c3"))
    val hamming =
      bit_count(col("a0").bitwiseXOR(col("c0"))) +
        bit_count(col("a1").bitwiseXOR(col("c1"))) +
        bit_count(col("a2").bitwiseXOR(col("c2"))) +
        bit_count(col("a3").bitwiseXOR(col("c3")))
    left.join(right, Seq("bi", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b") // pairs sharing several bands count once
      .withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Wrap a string column as a binary media payload (the fixtures carry no
    * real media; documents.text stands in as the payload bytes).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, format: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      lit(format).as("format"))
      .as[MediaItem]
  }

  /** Media items from a `binaryFile` crawl ([[graft.sources.Crawl.crawlRaw]]
    * with format "binaryFile": path, length, content, …): id is a stable
    * 64-bit hash of the path, format is the lower-cased file extension.
    * This is the real ingestion edge for media payloads — files land as
    * opaque binary columns with no driver round-trip.
    */
  def fromBinaryFiles(df: DataFrame): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      xxhash64(col("path")).as("id"),
      col("content").as("media"),
      lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("format"))
      .as[MediaItem]
  }

  /** Batched decode + feature extraction. Narrow (no shuffle); each task
    * processes its partition's items in order. `batchHint` only repartitions
    * when the input has fewer partitions than requested — on a cluster this
    * is the knob matching decode cost to executor count.
    */
  def extractFeatures(items: Dataset[MediaItem], batchHint: Int = 0): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    val sized =
      if (batchHint > items.rdd.getNumPartitions) items.repartition(batchHint) else items
    sized.mapPartitions { it =>
      it.map { m =>
        val px = Codecs.decodeMedia(m.media)
        MediaFeatures(m.id, m.format, m.media.length.toLong, Codecs.checksum(m.media), px)
      }
    }
  }

  /** Resize decoded features to `dim` buckets (area-style average pooling —
    * the STUB image analogue of a bilinear resize; deterministic).
    */
  def resize(feats: Dataset[MediaFeatures], dim: Int): Dataset[MediaFeatures] = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.map { f =>
      val src = f.features
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val lo = i * src.length / dim
        val hi = math.max((i + 1) * src.length / dim, lo + 1)
        var s = 0f; var j = lo
        while (j < hi && j < src.length) { s += src(j); j += 1 }
        out(i) = s / (hi - lo)
        i += 1
      }
      f.copy(features = out)
    }
  }

  final case class MediaFrame(id: Long, frame: Int, payload: Array[Byte])

  /** Sample `n` evenly spaced fixed-size frames from each payload — the
    * STUB video analogue of frame sampling: real codecs decode at
    * timestamps; the plumbing (one row per (item, frame), narrow flatMap,
    * bounded frame size) is what the distributed plan cares about.
    */
  def frameSample(items: Dataset[MediaItem], n: Int, frameBytes: Int = 64): Dataset[MediaFrame] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      val len = m.media.length
      (0 until n).iterator.map { f =>
        val off = if (n == 1) 0 else (f.toLong * math.max(len - frameBytes, 0) / math.max(n - 1, 1)).toInt
        MediaFrame(m.id, f, m.media.slice(off, math.min(off + frameBytes, len)))
      }
    }
  }
}
