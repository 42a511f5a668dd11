package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyframe extraction behind a pluggable [[FrameCodec]] — the
  * working CONSUMER of the inter-frame-video codec seam: everything
  * downstream of the decode callback (frame rows, per-frame perceptual
  * hashes, the banded Hamming near-dup join, video-level pair rollup)
  * is real, tested Spark plumbing; only the codec binding varies.
  * [[MjpegFrameCodec]] is the shipping JDK-only implementation
  * (MJPEG-in-AVI via [[AviMjpeg]]); an H.264-class deployment drops in
  * a JavaCV/JNI binding with the same two-method signature and
  * per-task `open()` init, touching no plan shape — `FrameExtractSpec`
  * proves the claim end-to-end with a deterministic H.264 test-double.
  *
  * Scale shape: decode is the only non-relational step (mapPartitions,
  * codec opened once per task, frames bounded by `maxFrames` so a
  * pathological million-frame file cannot blow a task); hashing rides
  * the same pass, and the pair stage is [[ImageHash.hammingPairs64]]'s
  * pigeonhole band join — shuffle on (band, slice) values, never pairs,
  * exact recall at the Hamming radius.
  */
object FrameExtract {

  /** The pluggable decode boundary. Implementations must be cheap to
    * serialize (ship to executors once per task set); heavyweight
    * native handles belong in `open()`, which runs once per task.
    */
  trait FrameCodec extends Serializable {
    /** Per-task init hook (native codecs allocate handles here). */
    def open(): FrameCodec = this

    /** Decoded keyframes of one payload in presentation order, at most
      * `maxFrames`; empty = not this codec's format or undecodable
      * (the row drops — a 100 TB media scan must not die on one
      * truncated file).
      */
    def keyframes(format: String, bytes: Array[Byte],
        maxFrames: Int): Seq[BufferedImage]
  }

  /** JDK-only shipping implementation: every MJPEG-in-AVI frame chunk
    * is a complete JPEG (all frames are keyframes), decoded with
    * `javax.imageio`. Non-AVI payloads and undecodable frames drop.
    */
  object MjpegFrameCodec extends FrameCodec {
    def keyframes(format: String, bytes: Array[Byte],
        maxFrames: Int): Seq[BufferedImage] =
      if (format != "avi") Seq.empty
      else AviMjpeg.parse(bytes, maxFrames).toSeq.flatMap(_.frames.flatMap { f =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
        catch { case scala.util.control.NonFatal(_) => None }
      })
  }

  /** Per-frame perceptual hashes `(idCol, frame_idx, phash)` of every
    * payload the codec can decode — one decode+hash pass, codec opened
    * once per task.
    */
  def keyframeHashes(media: DataFrame, idCol: String, bytesCol: String,
      codec: FrameCodec, maxFrames: Int = 8): DataFrame = {
    require(maxFrames > 0, s"maxFrames must be positive: $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"),
        Multimodal.sniffFormat(col(bytesCol)), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val c = codec.open()
        rows.flatMap { case (id, format, bytes) =>
          c.keyframes(format, bytes, maxFrames).zipWithIndex.map {
            case (img, i) => (id, i, ImageHash.aHash64(img))
          }
        }
      }
      .toDF(idCol, "frame_idx", "phash")
  }

  /** Video near-dup pairs `(id1, id2)` with id1 < id2: two videos pair
    * when ANY keyframe of one is within `maxHamming` bits of any
    * keyframe of the other — catches re-cuts that share interior
    * footage, which the first-frame fingerprint
    * ([[ImageHash.nearDupVideoPairs]]) cannot. Frame-level pairs come
    * from the shared pigeonhole band join on a packed (video, frame)
    * key, then roll up to distinct video pairs.
    */
  def nearDupByKeyframe(media: DataFrame, idCol: String, bytesCol: String,
      codec: FrameCodec = MjpegFrameCodec, maxFrames: Int = 8,
      maxHamming: Int = 4): DataFrame = {
    val hashes = keyframeHashes(media, idCol, bytesCol, codec, maxFrames)
    // packed frame key: frame_idx < maxFrames by construction, so
    // id * maxFrames + frame_idx is collision-free over NON-NEGATIVE
    // ids (negative or overflow-range ids fail loudly — the unpack
    // below is integral division, exact only on that domain; same
    // loud-guard policy as the pack-key radix)
    val keyed = hashes.select(
      (when(col(idCol) < 0 || col(idCol) >= Long.MaxValue / (maxFrames + 1L),
        raise_error(concat(lit("video id outside the frame-key domain "),
          lit(s"[0, ${Long.MaxValue / (maxFrames + 1L)}): "),
          col(idCol).cast("string"))))
        .otherwise(col(idCol)) * maxFrames + col("frame_idx")).as("__fid"),
      col("phash"))
    ImageHash.hammingPairs64(keyed, "__fid", "phash", maxHamming)
      .select(expr(s"id1 div $maxFrames").as("id1"),
        expr(s"id2 div $maxFrames").as("id2"))
      .filter(col("id1") =!= col("id2"))
      .distinct()
  }
}
