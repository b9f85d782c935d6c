package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary column plumbing: schema, batch shape, deterministic features") {
    import spark.implicits._
    val src = Seq((1L, "aaa"), (2L, "bbbb"), (3L, "ccccc"))
      .toDF("id", "content")
    val media = Multimodal.fromBinary(src, "id", "content", "image")
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "bytes", "meta"))

    val feats = Multimodal.extractFeatures(media, batchSize = 2,
      embeddingDim = 8).collect().sortBy(_.media_id)
    assert(feats.length === 3)
    assert(feats.forall(_.kind === "image"))
    assert(feats.map(_.n_bytes).toSeq === Seq(3L, 4L, 5L))
    assert(feats.forall(_.feature.length === 8))
    assert(feats.forall(f => f.decoded_width >= 1 && f.decoded_height >= 1))
    // determinism: same bytes → same features on a second run
    val again = Multimodal.extractFeatures(media, batchSize = 2,
      embeddingDim = 8).collect().sortBy(_.media_id)
    assert(again.map(_.content_hash).toSeq === feats.map(_.content_hash).toSeq)
    assert(again.map(_.feature.toSeq) === feats.map(_.feature.toSeq))
  }

  test("video kind samples frames; audio kind skips decode") {
    import spark.implicits._
    val media = Multimodal.fromBinary(
      Seq((9L, "framesframesframes")).toDF("id", "c"), "id", "c", "video")
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_frames_sampled >= 1)
    assert(f.decoded_width === 0) // image decode not attempted
  }
}
