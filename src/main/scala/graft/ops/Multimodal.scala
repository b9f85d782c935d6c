package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual codec work (JPEG decode, resample, frame extraction) needs
  * native media libraries that are NOT in this environment — those calls
  * are STUBBED behind [[Decoder]] with a deterministic fake. Everything
  * Spark-side is real and tested: the schema contract, the
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
