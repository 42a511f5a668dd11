package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: sniffing, frame windows, batch decode shape.
  * Payloads are synthesized binaries with real magic bytes.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    def payload(magic: Array[Byte], body: String): Array[Byte] =
      magic ++ body.getBytes("UTF-8")
    Seq(
      (1L, payload(Array(0xFF, 0xD8, 0xFF).map(_.toByte), "fake-jpeg-body-0123456789")),
      (2L, payload(Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte), "fake-png")),
      (3L, payload(Multimodal.RiffWavePrefix, "fake-wav-payload")),
      (4L, "no magic here, just text".getBytes("UTF-8")),
      (5L, payload(Multimodal.RiffAviPrefix, "fake-avi-payload")))
      .toDF("media_id", "bytes")
  }

  test("sniffFormat reads magic bytes via pure expressions") {
    val kinds = media.select(col("media_id"), Multimodal.sniffFormat(col("bytes")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(1L -> "jpeg", 2L -> "png", 3L -> "wav", 4L -> "unknown",
      5L -> "avi"))
  }

  test("byteFeatures yields size + head hex + format") {
    val row = media.filter(col("media_id") === 1)
      .select(Multimodal.byteFeatures(col("bytes")): _*).head()
    assert(row.getAs[Long]("n_bytes") == 3 + 25)
    assert(row.getAs[String]("head_hex").startsWith("FFD8FF"))
    assert(row.getAs[String]("format") == "jpeg")
  }

  test("sampleFrames windows the payload with stride and exact coverage") {
    val frames = Multimodal.sampleFrames(
      media.filter(col("media_id") === 1), "media_id", "bytes",
      frameSize = 10, everyN = 2).collect()
    // 28 bytes → frames 0,1,2 → kept 0,2
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(frames.head.getAs[Array[Byte]]("frame_bytes").length == 10)
    assert(frames.last.getAs[Array[Byte]]("frame_bytes").length == 8) // tail frame
  }

  test("decodeFeatures: per-partition stub codec, deterministic metadata") {
    val feats = Multimodal.decodeFeatures(media.repartition(3), "media_id", "bytes")
      .collect().map(f => f.mediaId -> f).toMap
    assert(feats(1L).format == "jpeg" && feats(2L).channels == 4)
    assert(feats.values.forall(f => f.width >= 16 && f.height >= 16))
    // invariant under partitioning (pure function of bytes)
    val again = Multimodal.decodeFeatures(media.repartition(1), "media_id", "bytes")
      .collect().map(f => f.mediaId -> f).toMap
    assert(feats == again)
  }

  test("JvmCodec really decodes JDK-supported formats (png/jpeg/wav)") {
    import spark.implicits._
    // real payloads produced by the same JDK codecs that will read them
    def image(w: Int, h: Int, tpe: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, tpe)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, x * 31 + y)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    def wav(frames: Int, sampleRate: Float, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 8, channels, true, false)
      val pcm = Array.tabulate(frames * channels)(i => (i % 127).toByte)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val real = Seq(
      (1L, image(20, 10, java.awt.image.BufferedImage.TYPE_INT_ARGB, "png")),
      (2L, image(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB, "jpg")),
      (3L, wav(frames = 4000, sampleRate = 8000f, channels = 1)),
      (4L, "not media at all".getBytes("UTF-8")))
      .toDF("media_id", "bytes")

    val feats = Multimodal.decodeFeatures(real.repartition(2), "media_id", "bytes",
      Multimodal.JvmCodec).collect().map(f => f.mediaId -> f).toMap
    // png: true pixel dimensions + alpha channel
    assert(feats(1L).format == "png" && feats(1L).width == 20 &&
      feats(1L).height == 10 && feats(1L).channels == 4)
    // jpeg: true pixel dimensions, 3 components
    assert(feats(2L).format == "jpeg" && feats(2L).width == 8 &&
      feats(2L).height == 6 && feats(2L).channels == 3)
    // wav: frame count, sample rate, mono
    assert(feats(3L).format == "wav" && feats(3L).width == 4000 &&
      feats(3L).height == 8000 && feats(3L).channels == 1)
    // unknown container falls back to the deterministic stub
    assert(feats(4L) == Multimodal.StubCodec.decode(4L, "unknown",
      "not media at all".getBytes("UTF-8")))
  }
}
