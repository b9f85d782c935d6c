package graft.ops

import graft.SparkSpec

class AudioFeaturesSpec extends SparkSpec {

  /** Synthesize a 16-bit PCM WAV: `freq` Hz sine at `amp`, `sec` long. */
  private def sineWav(
      freq: Double, sec: Double, rate: Float = 8000f,
      amp: Double = 0.5): Array[Byte] = {
    val n = (rate * sec).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      bb.putShort((amp * 32767.0 *
        math.sin(2.0 * math.Pi * freq * i / rate)).toShort)
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodes real WAV: rate, duration, RMS, zero-cross frequency") {
    val f = AudioFeatures.decodeWav(sineWav(440.0, 0.5))
    assert(f.sample_rate === 8000f)
    assert(f.channels === 1)
    assert(math.abs(f.duration_sec - 0.5) < 1e-3)
    // sine RMS = amp/√2
    assert(math.abs(f.rms - 0.5 / math.sqrt(2.0)) < 0.01)
    // a sine crosses zero 2·freq times per second
    assert(math.abs(f.zero_cross_rate - 2.0 * 440.0) < 20.0)
    assert(math.abs(f.peak - 0.5) < 0.01)
  }

  test("distributed features pass: decodes per partition, errors as values") {
    import spark.implicits._
    val rows = Seq(
      (1L, sineWav(200.0, 0.25)),
      (2L, sineWav(1000.0, 0.25)),
      (3L, Array[Byte](1, 2, 3))) // not a WAV
      .toDF("id", "bytes")
    val out = AudioFeatures.features(rows, "id", "bytes")
      .collect().sortBy(_._1)
    assert(out.length === 3)
    val z1 = out(0)._2.get.zero_cross_rate
    val z2 = out(1)._2.get.zero_cross_rate
    assert(math.abs(z1 - 400.0) < 20.0 && math.abs(z2 - 2000.0) < 40.0)
    assert(out(2)._2.isEmpty && out(2)._3 != null)
  }
}
