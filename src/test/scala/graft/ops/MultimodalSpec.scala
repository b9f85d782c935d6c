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

  /** A real PNG, generated with the JDK: horizontal luminance gradient so
    * left and right halves have distinct channel statistics.
    */
  private def pngBytes(w: Int, h: Int, seed: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val lum = ((x * 255) / math.max(1, w - 1) + seed) % 256
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: real PNG decode, resize round-trip, pixel-derived " +
    "embedding") {
    val dec = new Multimodal.ImageIoDecoder
    val png = pngBytes(40, 20)
    assert(dec.decodeImage(png) === ((40, 20)))
    assert(dec.sampleFrames(png, 10) === 1) // PNG: single frame

    // resize re-encodes a REAL image: the output is itself decodable and
    // has exactly the target dimensions
    val small = dec.resize(png, 16, 8)
    assert(dec.decodeImage(small) === ((16, 8)))

    // embedding is a function of the pixels: gradient cells increase
    // left-to-right, all values in [0,1], equal images collide, and a
    // different image lands elsewhere
    val e = dec.embed(png, 9)
    assert(e.length === 9)
    assert(e.forall(v => v >= 0f && v <= 1f))
    assert(e(0) < e(2)) // dark left cell < bright right cell
    assert(dec.embed(png, 9).toSeq === e.toSeq)
    assert(dec.embed(pngBytes(40, 20, seed = 128), 9).toSeq !== e.toSeq)
  }

  test("ImageIoDecoder drives the full Spark pipeline on real PNG bytes") {
    import spark.implicits._
    val src = Seq(
      (1L, pngBytes(32, 16)), (2L, pngBytes(64, 8)), (3L, pngBytes(10, 10)))
      .toDF("id", "content")
    val media = Multimodal.fromBinary(src, "id", "content", "image")
    val feats = Multimodal.extractFeatures(media,
      makeDecoder = () => new Multimodal.ImageIoDecoder,
      batchSize = 2, embeddingDim = 4).collect().sortBy(_.media_id)
    assert(feats.map(f => (f.decoded_width, f.decoded_height)).toSeq ===
      Seq((32, 16), (64, 8), (10, 10)))
    assert(feats.forall(_.feature.length === 4))

    val resized = Multimodal.resizeImages(media, targetW = 8, targetH = 8,
      makeDecoder = () => new Multimodal.ImageIoDecoder)
      .collect().sortBy(_.getLong(0))
    val dec = new Multimodal.ImageIoDecoder
    assert(resized.length === 3)
    assert(resized.forall(r =>
      dec.decodeImage(r.getAs[Array[Byte]]("bytes")) === ((8, 8))))
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
