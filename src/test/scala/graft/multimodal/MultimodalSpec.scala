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
      (3L, payload("RIFF".getBytes("US-ASCII"), "fake-wav-payload")),
      (4L, "no magic here, just text".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
  }

  test("sniffFormat reads magic bytes via pure expressions") {
    val kinds = media.select(col("media_id"), Multimodal.sniffFormat(col("bytes")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(1L -> "jpeg", 2L -> "png", 3L -> "wav", 4L -> "unknown"))
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
}
