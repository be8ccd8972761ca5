package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and per-item decode /
  * feature-extraction runs batched inside `mapPartitions` so a real codec
  * drops in without touching the distributed plan.
  *
  * The actual media codecs are STUBBED (this container has no image/audio
  * libraries): [[Codecs.decodeImage]] is a deterministic fake that derives
  * "pixels" from the bytes. Everything around it — schema, batch shape,
  * partition sizing, feature columns — is real and tested.
  */
object Multimodal {

  /** Typed media row: id + raw payload + metadata. */
  final case class MediaItem(id: Long, media: Array[Byte], format: String)

  /** Fixed-width feature record produced by the extract stage. */
  final case class MediaFeatures(
      id: Long, format: String, n_bytes: Long,
      checksum: Long, features: Array[Float])

  object Codecs {
    /** STUB: real implementation would decode `bytes` with an image codec
      * and return H×W×C pixels. The fake derives a deterministic byte
      * histogram so the pipeline stays testable end-to-end.
      */
    def decodeImage(bytes: Array[Byte]): Array[Float] = {
      // ??? <- real codec goes here; deterministic fake below.
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) % 16) += 1f; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < 16) { hist(j) /= bytes.length; j += 1 } }
      hist
    }

    def checksum(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
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
        val px = Codecs.decodeImage(m.media)
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
