package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The codec boundary is [[Decoder]]. For images it is REAL:
  * [[ImageIoDecoder]] decodes/resizes/re-encodes PNG/JPEG/BMP/GIF with
  * the JDK's built-in `javax.imageio` (no external dependency). Audio and
  * video codecs need native media libraries that are NOT in this
  * environment — for those, [[DeterministicFakeDecoder]] stands in (it
  * also keeps specs content-independent where that matters). Everything
  * Spark-side is real and tested either way: the schema contract, the
  * `mapPartitions` batch shape (the Scala analog of `mapInPandas` — one
  * iterator per partition, rows processed in bounded batches, no
  * driver-side collection), and the feature-struct output.
  */
object Multimodal {

  /** Canonical media-table schema: id + kind + raw bytes + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate_hz", IntegerType),
      StructField("duration_ms", LongType)
    )))
  ))

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: String,
      decoded_width: Int,
      decoded_height: Int,
      n_frames_sampled: Int,
      feature: Array[Float])

  /** The codec boundary. Real implementations would wrap libjpeg/ffmpeg
    * etc.; [[DeterministicFakeDecoder]] stands in for tests/CI.
    */
  trait Decoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): (Int, Int) // (width, height)
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Int // frames taken
    def embed(bytes: Array[Byte], dim: Int): Array[Float]
    /** Re-encode at target size; returns the new payload. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic stand-in: derives plausible values from a content hash
    * so tests are reproducible. A real decoder replaces this 1:1.
    */
  final class DeterministicFakeDecoder extends Decoder {
    private def h(bytes: Array[Byte]): Long =
      java.nio.ByteBuffer.wrap(
        java.security.MessageDigest.getInstance("MD5").digest(bytes), 0, 8)
        .getLong.abs

    def decodeImage(bytes: Array[Byte]): (Int, Int) = {
      val x = h(bytes)
      (((x % 1920) + 1).toInt, (((x / 1920) % 1080) + 1).toInt)
    }
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Int =
      ((h(bytes) % 240) / math.max(1, everyNth) + 1).toInt
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val seed = h(bytes)
      Array.tabulate(dim)(i =>
        (((seed * (i + 1) + 0x9e3779b97f4a7c15L) >>> 16) % 1000).toFloat / 1000f)
    }
    def resize(bytes: Array[Byte], w: Int, h0: Int): Array[Byte] = {
      // deterministic fake: payload proportional to target area, content
      // derived from the source hash so the op is reproducible
      val seed = h(bytes)
      val n = math.max(16, (w.toLong * h0 / 64).toInt)
      Array.tabulate(n)(i => ((seed >> (i % 56)) ^ i).toByte)
    }
  }

  /** Real image codec on the JDK's built-in `javax.imageio` (PNG / JPEG /
    * BMP / GIF — no external dependency): decode to true pixel dimensions,
    * resize through a `Graphics2D` bilinear draw and re-encode as PNG, and
    * derive a real (if simple) embedding from channel statistics over a
    * fixed sampling grid, so equal images embed equally and similar images
    * embed nearby. Frame sampling uses the ImageIO reader's frame index
    * (animated GIF is the one multi-frame format the JDK decodes); single-
    * frame formats report one frame. Audio/video codecs beyond that still
    * need native libraries absent from this environment —
    * [[DeterministicFakeDecoder]] remains the stand-in where a spec needs
    * content-independent reproducibility.
    */
  final class ImageIoDecoder extends Decoder {
    import java.io.ByteArrayInputStream
    import java.awt.image.BufferedImage

    private def read(bytes: Array[Byte]): BufferedImage = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      img
    }

    def decodeImage(bytes: Array[Byte]): (Int, Int) = {
      val img = read(bytes)
      (img.getWidth, img.getHeight)
    }

    def sampleFrames(bytes: Array[Byte], everyNth: Int): Int = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        require(readers.hasNext, "undecodable media payload")
        val reader = readers.next()
        reader.setInput(in)
        val n = reader.getNumImages(true) // count frames (GIF: animation)
        reader.dispose()
        (n + math.max(1, everyNth) - 1) / math.max(1, everyNth)
      } finally in.close()
    }

    /** Channel-statistics embedding: luminance + RGB means over a
      * ceil(sqrt(dim)) × grid of cells, flattened and truncated to `dim`,
      * each in [0,1]. Not a learned embedding, but a real function of the
      * pixels: identical images collide, near-duplicates land close —
      * exactly what the dedup/ANN operators need from this column.
      */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = read(bytes)
      val grid = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
      val out = new Array[Float](dim)
      var k = 0
      var gy = 0
      while (gy < grid && k < dim) {
        var gx = 0
        while (gx < grid && k < dim) {
          val x0 = gx * img.getWidth / grid
          val x1 = math.max(x0 + 1, (gx + 1) * img.getWidth / grid)
          val y0 = gy * img.getHeight / grid
          val y1 = math.max(y0 + 1, (gy + 1) * img.getHeight / grid)
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(math.min(x, img.getWidth - 1),
                math.min(y, img.getHeight - 1))
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
              n += 1
              x += 1
            }
            y += 1
          }
          out(k) = (sum / math.max(1, n)).toFloat
          k += 1
          gx += 1
        }
        gy += 1
      }
      out
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = read(bytes)
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Decode + feature-extract, batched per partition. The decoder is
    * constructed once per partition (expensive native init amortized),
    * and rows stream through in `batchSize` groups — the executor never
    * materializes the whole partition of raw bytes.
    */
  def extractFeatures(
      media: DataFrame,
      makeDecoder: () => Decoder = () => new DeterministicFakeDecoder,
      batchSize: Int = 64,
      embeddingDim: Int = 16,
      frameEveryNth: Int = 10): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").mapPartitions { rows =>
      val decoder = makeDecoder()
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, ht) = if (kind == "image") decoder.decodeImage(bytes) else (0, 0)
          val frames =
            if (kind == "video") decoder.sampleFrames(bytes, frameEveryNth) else 0
          MediaFeatures(
            media_id = id,
            kind = kind,
            n_bytes = bytes.length.toLong,
            content_hash = md5Hex(bytes),
            decoded_width = w,
            decoded_height = ht,
            n_frames_sampled = frames,
            feature = decoder.embed(bytes, embeddingDim))
        }
      }
    }
  }

  /** Resize/re-encode, batched per partition — same shape as
    * [[extractFeatures]]: decoder built once per partition, rows stream
    * through in bounded batches, output is a new media frame with the
    * target dimensions in the metadata and the re-encoded payload in
    * `bytes`. At 100 TB this is the canonical media ETL step: map-only,
    * no shuffle, output partitioning inherited from the input.
    */
  def resizeImages(
      media: DataFrame,
      targetW: Int,
      targetH: Int,
      makeDecoder: () => Decoder = () => new DeterministicFakeDecoder,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").mapPartitions { rows =>
      val decoder = makeDecoder()
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.collect {
          case r if r.getString(1) == "image" =>
            (r.getLong(0), r.getString(1),
              decoder.resize(r.getAs[Array[Byte]](2), targetW, targetH))
        }
      }
    }.toDF("media_id", "kind", "bytes")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit("image/resized").as("mime"),
        org.apache.spark.sql.functions.lit(targetW).as("width"),
        org.apache.spark.sql.functions.lit(targetH).as("height"),
        org.apache.spark.sql.functions.lit(null).cast("int").as("sample_rate_hz"),
        org.apache.spark.sql.functions.lit(null).cast("long").as("duration_ms")))
  }

  /** Synthesize a media table from any binary payload source (used by
    * tests; in production this is `spark.read.format("binaryFile")`).
    */
  def fromBinary(df: DataFrame, idCol: String, bytesCol: String,
      kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(bytesCol).cast("binary").as("bytes"),
      struct(
        lit(s"application/x-$kind").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate_hz"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
}
