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

  test("resize: images re-encode with target metadata, non-images drop; " +
    "deterministic payloads") {
    import spark.implicits._
    val imgs = Multimodal.fromBinary(
      Seq((1L, "aaa"), (2L, "bbbb")).toDF("id", "c"), "id", "c", "image")
    val vids = Multimodal.fromBinary(
      Seq((3L, "vvv")).toDF("id", "c"), "id", "c", "video")
    val resized = Multimodal.resizeImages(
      imgs.unionByName(vids), targetW = 64, targetH = 32, batchSize = 1)
    assert(resized.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "bytes", "meta"))
    val rows = resized.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // video dropped
    val meta = rows.head.getStruct(3)
    assert(meta.getString(0) === "image/resized")
    assert(meta.getInt(1) === 64 && meta.getInt(2) === 32)
    val again = Multimodal.resizeImages(imgs, 64, 32).collect()
      .sortBy(_.getLong(0)).map(_.getAs[Array[Byte]]("bytes").toSeq)
    assert(rows.take(2).map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq ===
      again.toSeq)
  }
}
