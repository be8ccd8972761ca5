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

  test("frameSample emits n bounded frames per item") {
    val docs = Tables.load(spark, sfDir, "documents").limit(10)
    val items = Multimodal.asMedia(docs, "doc_id", "text", "video/fake")
    val frames = Multimodal.frameSample(items, n = 3, frameBytes = 16).collect()
    assert(frames.length == 30)
    assert(frames.forall(_.payload.length <= 16))
    assert(frames.groupBy(_.id).forall(_._2.map(_.frame).sorted.toSeq == Seq(0, 1, 2)))
  }
}
