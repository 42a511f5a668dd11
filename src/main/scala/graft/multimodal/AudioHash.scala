package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio dedup — the wav face of the 64-bit hash family: an
  * energy-envelope hash (64 equal time windows over the PCM stream,
  * bit j set when window j's mean |amplitude| beats the overall mean),
  * decoded executor-side with the JDK-only `javax.sound.sampled`
  * boundary [[Multimodal.JvmCodec]] already uses, then Hamming
  * near-dup pairs via the shared pigeonhole banding
  * ([[ImageHash.hammingPairs64]]).
  *
  * The envelope is amplitude-shape only (no spectral transform), which
  * is exactly what re-encoded / gain-tweaked copies preserve — the
  * dedup question — while different material diverges. Undecodable
  * payloads are dropped, not fatal.
  */
object AudioHash {

  /** 64-bit energy-envelope hash of 16-bit little-endian PCM frames.
    * Callers must normalize first — [[pcm16le]] converts any
    * JDK-decodable stream (8/24-bit, big-endian, unsigned) to this
    * layout, so the same audio hashes the same regardless of its
    * container encoding.
    */
  def envelopeHash64(pcm: Array[Byte]): Long = {
    val nSamples = pcm.length / 2
    if (nSamples == 0) return 0L
    val windows = new Array[Double](64)
    val counts = new Array[Int](64)
    var i = 0
    while (i < nSamples) {
      val lo = pcm(2 * i) & 0xff
      val hi = pcm(2 * i + 1).toInt
      val sample = (hi << 8) | lo
      val w = (i.toLong * 64 / nSamples).toInt
      windows(w) += math.abs(sample)
      counts(w) += 1
      i += 1
    }
    var j = 0
    var total = 0.0
    while (j < 64) {
      if (counts(j) > 0) windows(j) /= counts(j)
      total += windows(j)
      j += 1
    }
    val mean = total / 64
    var bits = 0L
    j = 0
    while (j < 64) {
      if (windows(j) > mean) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Decode a wav payload and normalize to 16-bit signed little-endian
    * PCM (the JDK converts 8/24-bit, unsigned, and big-endian streams)
    * so the envelope hash is encoding-invariant.
    */
  private[multimodal] def pcm16le(bytes: Array[Byte]): Array[Byte] = {
    val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val f = src.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        f.getSampleRate, 16, f.getChannels, true, false)
      val conv =
        if (f.getSampleSizeInBits == 16 && !f.isBigEndian &&
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) src
        else javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
      try conv.readAllBytes() finally conv.close()
    } finally src.close()
  }

  /** (idCol, ahash) for every decodable wav row; everything else is
    * dropped. Same mapPartitions decode shape as the image path.
    */
  def audioHashes(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"),
        Multimodal.sniffFormat(col(bytesCol)), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, format, bytes) =>
          if (format != "wav") None
          else try Some((id, envelopeHash64(pcm16le(bytes))))
          catch { case scala.util.control.NonFatal(_) => None }
        }
      }
      .toDF(idCol, "ahash")
  }

  /** Near-dup audio pairs (id1 < id2, hamming <= maxHamming). */
  def nearDupAudioPairs(media: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 4): DataFrame =
    ImageHash.hammingPairs64(audioHashes(media, idCol, bytesCol), idCol,
      "ahash", maxHamming)
}
