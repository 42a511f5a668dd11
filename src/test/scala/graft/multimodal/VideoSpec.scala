package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MJPEG-in-AVI decode over REAL container bytes built in-test: a
  * minimal RIFF writer emits the same chunk tree a capture tool
  * would, frames are genuine JPEGs from the JDK encoder, and the
  * parser/codec/perceptual-hash paths read them back.
  */
class VideoSpec extends SparkSpec {

  // ---- minimal RIFF/AVI writer ------------------------------------
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] = if (data.length % 2 == 1) Array(0.toByte) else Array.empty
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  private def list(typ: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ children)

  private def jpeg(w: Int, h: Int, seed: Int, noise: Int = 0,
      invert: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val g = ((x * 17 + y * 31 + seed) + (if ((x + y) % 9 == 0) noise else 0)) % 256
      val v = if (invert) 255 - g else g
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val avih = new Array[Byte](56)
    def put(off: Int, v: Int): Unit = le32(v).copyToArray(avih, off)
    put(16, frames.length); put(32, w); put(36, h)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  private def avi(seed: Int, noise: Int = 0, w: Int = 64, h: Int = 48,
      nFrames: Int = 3, invert: Boolean = false): Array[Byte] =
    mjpegAvi((0 until nFrames).map(i =>
      jpeg(w, h, seed + i * 100, noise, invert)), w, h)

  // ------------------------------------------------------------------

  test("parser reads header dims, counts all frames, retains the asked-for few") {
    val info = AviMjpeg.parse(avi(seed = 1, nFrames = 5), maxFrames = 2).get
    assert(info.width === 64 && info.height === 48)
    assert(info.totalFrames === 5 && info.frames.length === 2)
    // retained frames are genuine JPEGs
    assert(info.frames.forall(f => (f(0) & 0xff) == 0xFF && (f(1) & 0xff) == 0xD8))
  }

  test("truncated and hostile payloads parse to None, never throw") {
    val good = avi(seed = 2)
    assert(AviMjpeg.parse(good.take(good.length / 2)).isEmpty ||
      AviMjpeg.parse(good.take(good.length / 2)).nonEmpty) // no throw is the point
    assert(AviMjpeg.parse(Array[Byte](1, 2, 3)).isEmpty)
    // chunk claiming to be larger than the buffer
    val evil = good.clone()
    le32(Int.MaxValue).copyToArray(evil, 16)
    AviMjpeg.parse(evil) // must not over-read or throw
    // thousands of nested LISTs: must not blow the stack
    val deep = (1 to 20000).foldLeft("x".getBytes("US-ASCII")) {
      (inner, _) => chunk("LIST", "junk".getBytes("US-ASCII") ++ inner)
    }
    AviMjpeg.parse(chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ deep))
  }

  test("JvmCodec decodes avi: real dims, frame channels, no stub fallback") {
    import spark.implicits._
    val media = Seq((1L, avi(seed = 3)), (2L, "not a video".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val feats = Multimodal.decodeFeatures(media, "media_id", "bytes",
      Multimodal.JvmCodec).collect().map(f => f.mediaId -> f).toMap
    assert(feats(1L).format === "avi")
    assert(feats(1L).width === 64 && feats(1L).height === 48)
    assert(feats(1L).channels === 3)
  }

  test("sniff discriminates wav vs avi vs bare riff") {
    import spark.implicits._
    val media = Seq(
      (1L, avi(seed = 4)),
      (2L, Multimodal.RiffWavePrefix ++ "body".getBytes),
      (3L, "RIFF1234junk".getBytes("US-ASCII"))).toDF("media_id", "bytes")
    val kinds = media.select(col("media_id"),
        Multimodal.sniffFormat(col("bytes")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds === Map(1L -> "avi", 2L -> "wav", 3L -> "riff"))
  }

  test("videoFrames feeds the image pipeline: frames sniff as jpeg and hash") {
    import spark.implicits._
    val media = Seq((1L, avi(seed = 5, nFrames = 4)),
      (2L, "not a video".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val frames = Multimodal.videoFrames(media, "media_id", "bytes", maxFrames = 2)
    val rows = frames.collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSet === Set((1L, 0), (1L, 1)))
    // extracted frames ARE images to the rest of the stack
    val kinds = frames.select(Multimodal.sniffFormat(col("frame_bytes")).as("k"))
      .as[String].collect().toSet
    assert(kinds === Set("jpeg"))
    val hashed = ImageHash.imageHashes(
      frames.select(col("frame_idx").cast("long").as("fid"), col("frame_bytes")),
      "fid", "frame_bytes")
    assert(hashed.count() === 2)
  }

  test("perceptual video dedup: noisy re-encode pairs, different content does not") {
    import spark.implicits._
    val media = Seq(
      (1L, avi(seed = 10)),
      (2L, avi(seed = 10, noise = 6)),  // same opening frame + mild noise
      (3L, avi(seed = 10, invert = true))) // structurally different video
      .toDF("media_id", "bytes")
    val pairs = ImageHash.nearDupVideoPairs(media, "media_id", "bytes", maxHamming = 10)
      .select(col("id1"), col("id2")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
