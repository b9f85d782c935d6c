package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL audio decode + feature extraction for WAV/PCM payloads on the
  * JDK's built-in `javax.sound.sampled` (no external dependency) — the
  * audio counterpart of [[Multimodal.ImageIoDecoder]]: where the
  * environment has no native media libraries, the JDK still decodes
  * RIFF/WAV PCM completely, so the audio leg of a multimodal pipeline
  * can compute true signal features (duration, RMS energy, zero-crossing
  * rate, peak) instead of the deterministic fake. Compressed codecs
  * (MP3/AAC/Opus) remain behind [[Multimodal.DeterministicFakeDecoder]].
  *
  * Scale shape: one `mapPartitions` pass, decoder state per partition,
  * rows stream through — identical plumbing to the image pipeline. A
  * 100 TB audio corpus is embarrassingly parallel here; the only
  * exchange is whatever aggregation the caller adds downstream.
  */
object AudioFeatures {

  final case class WavFeatures(
      sample_rate: Float,
      channels: Int,
      n_frames: Long,
      duration_sec: Double,
      rms: Double,
      zero_cross_rate: Double, // crossings per second, channel 0
      peak: Double)

  /** Decode a complete WAV payload and compute signal statistics over
    * the PCM samples (16-bit signed little/big-endian as declared by the
    * header; normalized to [-1, 1]).
    */
  def decodeWav(bytes: Array[Byte]): WavFeatures = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
      val frameSize = fmt.getFrameSize
      val channels = fmt.getChannels
      val data = in.readAllBytes()
      val nFrames = data.length / frameSize
      val order =
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN
      val buf = java.nio.ByteBuffer.wrap(data).order(order)
      var sumSq = 0.0
      var peak = 0.0
      var crossings = 0L
      var prevSign = 0
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < channels) {
          val s = buf.getShort((f * frameSize) + c * 2) / 32768.0
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
          if (c == 0) {
            val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
            if (prevSign != 0 && sign != 0 && sign != prevSign)
              crossings += 1
            if (sign != 0) prevSign = sign
          }
          c += 1
        }
        f += 1
      }
      val duration = nFrames.toDouble / fmt.getFrameRate
      WavFeatures(
        sample_rate = fmt.getSampleRate,
        channels = channels,
        n_frames = nFrames.toLong,
        duration_sec = duration,
        rms = if (nFrames == 0) 0.0
          else math.sqrt(sumSq / (nFrames.toLong * channels)),
        zero_cross_rate =
          if (duration == 0.0) 0.0 else crossings / duration,
        peak = peak)
    } finally in.close()
  }

  /** Per-row WAV features over a binary column: one mapPartitions pass,
    * no shuffle. Undecodable payloads surface as error rows (error-as-
    * value, the library's capture-boundary convention), never task
    * failures.
    */
  def features(
      df: DataFrame,
      idCol: String,
      bytesCol: String): Dataset[(Long, Option[WavFeatures], String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol, bytesCol).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try (id, Some(decodeWav(bytes)), null: String)
        catch { case e: Exception => (id, None, e.toString) }
      })
  }
}
