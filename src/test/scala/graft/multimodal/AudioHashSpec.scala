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

  /** Mono wav at the given bit depth: amplitude-modulated tone. */
  private def wavBytes(freq: Double, gain: Double, beatHz: Double,
      bits: Int = 16): Array[Byte] = {
    val rate = 8000
    val n = rate // 1 second
    val bytesPer = bits / 8
    val pcm = new Array[Byte](n * bytesPer)
    for (i <- 0 until n) {
      val t = i.toDouble / rate
      val env = 0.5 + 0.5 * math.sin(2 * math.Pi * beatHz * t)
      val amp = gain * env * math.sin(2 * math.Pi * freq * t)
      if (bits == 16) {
        val s = (amp * 12000).toInt
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      } else {
        // 8-bit wav is UNSIGNED PCM centered on 128
        pcm(i) = (128 + (amp * 100).toInt).toByte
      }
    }
    val fmt =
      if (bits == 16) new AudioFormat(rate.toFloat, 16, 1, true, false)
      else new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        rate.toFloat, 8, 1, 1, rate.toFloat, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def hashOf(bytes: Array[Byte]): Long =
    AudioHash.envelopeHash64(AudioHash.pcm16le(bytes))

  test("envelope hash is stable under gain change, far for different material") {
    val a = hashOf(wavBytes(440, 1.0, 3))
    val b = hashOf(wavBytes(440, 0.8, 3)) // same envelope shape, lower gain
    val c = hashOf(wavBytes(440, 1.0, 11)) // different amplitude envelope
    assert(java.lang.Long.bitCount(a ^ b) <= 4,
      s"gain-tweaked copy drifted ${java.lang.Long.bitCount(a ^ b)} bits")
    assert(java.lang.Long.bitCount(a ^ c) > 8,
      s"different envelope is only ${java.lang.Long.bitCount(a ^ c)} bits away")
  }

  test("an 8-bit re-encode hashes near its 16-bit original") {
    val a = hashOf(wavBytes(440, 1.0, 3, bits = 16))
    val b = hashOf(wavBytes(440, 1.0, 3, bits = 8)) // same audio, 8-bit container
    assert(java.lang.Long.bitCount(a ^ b) <= 4,
      s"8-bit re-encode drifted ${java.lang.Long.bitCount(a ^ b)} bits")
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
