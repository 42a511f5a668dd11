package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The frame-codec seam driven end-to-end from BOTH sides:
  *   - the shipping [[FrameExtract.MjpegFrameCodec]] over real
  *     MJPEG-in-AVI container bytes (a re-cut sharing only INTERIOR
  *     footage pairs up — the case the first-frame fingerprint
  *     provably misses);
  *   - a deterministic H.264 test-double that honours the exact
  *     contract a JavaCV/JNI binding would (Annex-B start-code
  *     sniffing, per-task `open()` init, bounded frames), proving an
  *     inter-frame codec drops into the SAME plumbing — decode
  *     callback → frame hashes → banded Hamming join → video pairs —
  *     with no plan change.
  */
/** The H.264 test-double (top level — an inner class would drag the
  * non-serializable spec along as `$outer`). Payload = Annex-B start
  * code (00 00 00 01) + one seed byte per "keyframe"; seed s decodes
  * to a 16x16 THERMOMETER image — 8x8 grid cell i is white iff
  * i*4 < s, so the frame's aHash is a thermometer codeword and
  * Hamming distance between two frames is |ceil(a/4) - ceil(b/4)|:
  * deterministic, and CLOSE seeds make near-dup frames exactly like
  * mildly re-encoded real footage. (A solid image would be useless
  * here: every cell equals the mean, so aHash degenerates to 0.)
  */
class FakeH264Codec(private val opened: Boolean = false)
    extends FrameExtract.FrameCodec {
  override def open(): FrameExtract.FrameCodec = new FakeH264Codec(true)
  def keyframes(format: String, bytes: Array[Byte],
      maxFrames: Int): Seq[BufferedImage] = {
    // the per-task init contract is part of the seam: a native codec
    // allocates its handles in open(), so decoding unopened is a bug
    if (!opened) throw new IllegalStateException("codec used before open()")
    if (format != "unknown" || bytes.length < 5 ||
        !bytes.take(4).sameElements(FakeH264Codec.AnnexB)) Seq.empty
    else bytes.drop(4).take(maxFrames).toSeq.map { s =>
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      val g = java.lang.Byte.toUnsignedInt(s)
      for (x <- 0 until 16; y <- 0 until 16) {
        val cell = (y / 2) * 8 + (x / 2)
        val v = if (cell * 4 < g) 255 else 0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
  }
}

object FakeH264Codec {
  val AnnexB: Array[Byte] = Array[Byte](0, 0, 0, 1)
}

class FrameExtractSpec extends SparkSpec {

  // ---- minimal RIFF/AVI writer (VideoSpec's fixture shape) ---------
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] = if (data.length % 2 == 1) Array(0.toByte) else Array.empty
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  private def list(typ: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ children)

  private def jpeg(w: Int, h: Int, seed: Int, noise: Int = 0): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val g = ((x * 17 + y * 31 + seed) + (if ((x + y) % 9 == 0) noise else 0)) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = new Array[Byte](56)
    def put(off: Int, v: Int): Unit = le32(v).copyToArray(avih, off)
    put(16, frames.length); put(32, 64); put(36, 48)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  // ---- the H.264 test-double ---------------------------------------
  // Payload = Annex-B start code (00 00 00 01) + one seed byte per
  // "keyframe". The double decodes seed s to a solid 16x16 gray-level
  // image — deterministic, so two payloads sharing a seed byte share a
  // frame hash exactly like two real videos sharing footage.
  private def h264(seeds: Int*): Array[Byte] =
    FakeH264Codec.AnnexB ++ seeds.map(_.toByte).toArray

  test("MJPEG keyframes: one hash row per frame, bounded by maxFrames") {
    import spark.implicits._
    val media = Seq(
      (1L, mjpegAvi(Seq(jpeg(64, 48, 1), jpeg(64, 48, 101), jpeg(64, 48, 201)))),
      (2L, "not a video".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val rows = FrameExtract.keyframeHashes(media, "media_id", "bytes",
      FrameExtract.MjpegFrameCodec, maxFrames = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSet === Set((1L, 0), (1L, 1)),
      s"expected 2 bounded frame rows for the avi only: ${rows.toSeq}")
  }

  test("a re-cut sharing only interior footage pairs; first-frame fingerprint misses it") {
    import spark.implicits._
    val shared = jpeg(64, 48, 500)
    val sharedNoisy = jpeg(64, 48, 500, noise = 6)
    val media = Seq(
      (1L, mjpegAvi(Seq(jpeg(64, 48, 1), shared))),
      (2L, mjpegAvi(Seq(jpeg(64, 48, 7777), sharedNoisy))), // different cut, shared interior
      (3L, mjpegAvi(Seq(jpeg(64, 48, 3000), jpeg(64, 48, 4000)))))
      .toDF("media_id", "bytes")
    val byKeyframe = FrameExtract.nearDupByKeyframe(media, "media_id", "bytes",
      maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byKeyframe === Set((1L, 2L)),
      s"interior-footage pair not found (or spurious pairs): $byKeyframe")
    val byFirstFrame = ImageHash.nearDupVideoPairs(media, "media_id", "bytes",
      maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!byFirstFrame.contains((1L, 2L)),
      "fixture defect: the opening frames near-dup, so the keyframe " +
        "path proves nothing beyond first-frame")
  }

  test("H.264 test-double: an inter-frame codec drops into the same plumbing") {
    import spark.implicits._
    val media = Seq(
      (10L, h264(5, 60)),
      (11L, h264(200, 61)), // seed 61 is 1 gray level from 60: near-dup frame
      (12L, h264(120, 130)),
      (13L, mjpegAvi(Seq(jpeg(64, 48, 1)))), // wrong container: double ignores
      (14L, "plain text".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val hashes = FrameExtract.keyframeHashes(media, "media_id", "bytes",
      new FakeH264Codec(), maxFrames = 8)
    assert(hashes.filter(col("media_id").isin(13L, 14L)).count() === 0,
      "the double must decode only its own format")
    assert(hashes.filter(col("media_id").isin(10L, 11L, 12L)).count() === 6)
    val pairs = FrameExtract.nearDupByKeyframe(media, "media_id", "bytes",
      new FakeH264Codec(), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)),
      s"shared-footage videos must pair through the double: $pairs")
  }

  test("pair rollup is deterministic under repartitioning") {
    import spark.implicits._
    val media = (0 until 24).map { i =>
      (i.toLong, h264(i % 6, 200 + i % 4))
    }.toDF("media_id", "bytes")
    def once(parts: Int) =
      FrameExtract.nearDupByKeyframe(media.repartition(parts), "media_id",
        "bytes", new FakeH264Codec(), maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = once(2)
    val b = once(7)
    assert(a === b)
    assert(a.nonEmpty)
  }
}
