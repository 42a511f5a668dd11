package graft.multimodal

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec

/** Perceptual audio dedup over REAL wav payloads (generated in-test,
  * decoded by the JDK): gain-tweaked copies stay within the Hamming
  * budget, different material lands far, the banded join finds exactly
  * the near-dup pair.
  */
class AudioHashSpec extends SparkSpec {

  /** Mono 16-bit wav: amplitude-modulated tone, deterministic. */
  private def wavBytes(freq: Double, gain: Double, beatHz: Double): Array[Byte] = {
    val rate = 8000
    val n = rate // 1 second
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = i.toDouble / rate
      val env = 0.5 + 0.5 * math.sin(2 * math.Pi * beatHz * t)
      val s = (gain * env * 12000 * math.sin(2 * math.Pi * freq * t)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("envelope hash is stable under gain change, far for different material") {
    def hashOf(bytes: Array[Byte]): Long = {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try AudioHash.envelopeHash64(in.readAllBytes(), in.getFormat.getChannels)
      finally in.close()
    }
    val a = hashOf(wavBytes(440, 1.0, 3))
    val b = hashOf(wavBytes(440, 0.8, 3)) // same envelope shape, lower gain
    val c = hashOf(wavBytes(440, 1.0, 11)) // different amplitude envelope
    assert(java.lang.Long.bitCount(a ^ b) <= 4,
      s"gain-tweaked copy drifted ${java.lang.Long.bitCount(a ^ b)} bits")
    assert(java.lang.Long.bitCount(a ^ c) > 8,
      s"different envelope is only ${java.lang.Long.bitCount(a ^ c)} bits away")
  }

  test("banded pair join finds exactly the near-dup audio pair") {
    import spark.implicits._
    val rows = Seq(
      (1L, wavBytes(440, 1.0, 3)),
      (2L, wavBytes(440, 0.8, 3)),
      (3L, wavBytes(440, 1.0, 11)),
      (4L, "not audio".getBytes("UTF-8")) // dropped, not fatal
    ).toDF("media_id", "bytes")
    val pairs = AudioHash.nearDupAudioPairs(rows, "media_id", "bytes",
      maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
