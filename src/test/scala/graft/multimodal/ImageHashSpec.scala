package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** Perceptual image dedup over REAL png payloads (generated in-test,
  * decoded by the JDK): re-encodes hash identically, small perturbations
  * stay within the Hamming budget, different content lands far, and the
  * banded pair join finds exactly the near-dups.
  */
class ImageHashSpec extends SparkSpec {

  /** Deterministic 64x64 gradient-with-stripes test image. */
  private def baseImage(): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val lum = ((x * 2 + y) % 256 + (if ((x / 8) % 2 == 0) 40 else 0)) % 256
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    img
  }

  /** The base image with a mild brightness bump in one corner cell. */
  private def perturbed(): BufferedImage = {
    val img = baseImage()
    for (y <- 0 until 8; x <- 0 until 8) {
      val rgb = img.getRGB(x, y)
      val lum = math.min((rgb & 0xff) + 6, 255)
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    img
  }

  /** Structurally different content: the inverted base. */
  private def inverted(): BufferedImage = {
    val img = baseImage()
    for (y <- 0 until 64; x <- 0 until 64) {
      val lum = 255 - (img.getRGB(x, y) & 0xff)
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    img
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash is stable under re-encode and near under mild perturbation") {
    val a = ImageHash.aHash64(baseImage())
    val a2 = ImageHash.aHash64(
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(pngBytes(baseImage()))))
    assert(a === a2, "decode(encode(img)) must hash identically")
    val b = ImageHash.aHash64(perturbed())
    assert(java.lang.Long.bitCount(a ^ b) <= 4,
      s"perturbed image drifted ${java.lang.Long.bitCount(a ^ b)} bits")
    val c = ImageHash.aHash64(inverted())
    assert(java.lang.Long.bitCount(a ^ c) > 16,
      s"inverted image is only ${java.lang.Long.bitCount(a ^ c)} bits away")
  }

  test("banded pair join finds exactly the near-dup image pair") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(baseImage())),
      (2L, pngBytes(perturbed())),
      (3L, pngBytes(inverted())),
      (4L, "not an image at all".getBytes("UTF-8")) // dropped, not fatal
    ).toDF("media_id", "bytes")
    val pairs = ImageHash.nearDupImagePairs(rows, "media_id", "bytes",
      maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("hashes are invariant under repartitioning") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(baseImage())),
      (2L, pngBytes(perturbed())),
      (3L, pngBytes(inverted()))
    ).toDF("media_id", "bytes")
    def run(parts: Int) =
      ImageHash.imageHashes(rows.repartition(parts), "media_id", "bytes")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === run(3))
  }
}
