package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media payloads are opaque `binary` columns with typed
  * metadata; everything structural — format sniffing, byte features,
  * frame windowing, batch decode plumbing — is real Spark, while the
  * actual codec call is an explicitly-marked deterministic STUB (the
  * container has no image/audio libraries; swap `StubCodec` for a real
  * binding without touching any plan shape).
  *
  * Scale notes: payload bytes ride the row (parquet binary column), so
  * partition sizing is byte-driven — size
  * `spark.sql.files.maxPartitionBytes` for media tables; decode runs
  * per-partition (`mapPartitions`) so codec init is amortized per task,
  * the same batch shape a Pandas-UDF `mapInPandas` would give PySpark.
  */
object Multimodal {

  /** Magic-byte prefixes for format sniffing. */
  val Magic: Seq[(String, Array[Byte])] = Seq(
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "png" -> Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte),
    "gif" -> "GIF8".getBytes("US-ASCII"),
    "wav" -> "RIFF".getBytes("US-ASCII"),
    "mp3" -> "ID3".getBytes("US-ASCII"))

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  /** Container-format sniff from leading magic bytes — pure codegen'd
    * expressions (hex + substring on binary), no UDF.
    */
  def sniffFormat(bytes: Column): Column =
    Magic.foldRight(lit("unknown"): Column) { case ((name, magic), acc) =>
      when(hex(substring(bytes, 1, magic.length)) === hexOf(magic), lit(name))
        .otherwise(acc)
    }

  /** Structural byte features: size + head/tail fingerprints. */
  def byteFeatures(bytes: Column): Seq[Column] = Seq(
    length(bytes).cast("long").as("n_bytes"),
    hex(substring(bytes, 1, 4)).as("head_hex"),
    sniffFormat(bytes).as("format"))

  /** Fixed-size frame windows over a binary payload (video frame-sample
    * analog): one row per window of `frameSize` bytes, every `everyN`-th
    * kept. Pure exprs: sequence → transform(substring) → explode.
    */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int, everyN: Int): DataFrame = {
    val nBytes = length(col(bytesCol))
    val nFrames = ceil(nBytes.cast("double") / frameSize).cast("int")
    val kept = filter(
      sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % everyN === 0 && i * frameSize < nBytes)
    df.select(col(idCol),
      explode(transform(kept, i => struct(
        i.as("frame_idx"),
        col(bytesCol).substr(i * frameSize + 1, lit(frameSize)).as("frame_bytes")))).as("f"))
      .select(col(idCol),
        col("f.frame_idx").as("frame_idx"), col("f.frame_bytes").as("frame_bytes"))
  }

  // ---------------------------------------------------------------------
  // Decode boundary
  // ---------------------------------------------------------------------

  /** Decoded-media feature record (what a real image decoder yields). */
  final case class MediaFeatures(
      mediaId: Long, format: String, nBytes: Long,
      width: Int, height: Int, channels: Int, contentHash: Long)

  /** THE CODEC STUB — deterministic fake decode.
    *
    * A real deployment replaces this object with a JNI/Java binding
    * (e.g. TwelveMonkeys ImageIO, JavaCV): same signature, same
    * per-partition init pattern. The fake derives plausible metadata
    * purely from the bytes so tests are reproducible anywhere.
    */
  object StubCodec {
    /** Simulated per-task decoder handle (amortized init). */
    def open(): StubCodec.type = this
    def decode(id: Long, format: String, bytes: Array[Byte]): MediaFeatures = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val w = 16 + (math.abs(h) % 1024).toInt
      MediaFeatures(id, format, bytes.length.toLong,
        width = w, height = 16 + (math.abs(h >> 10) % 1024).toInt,
        channels = if (format == "png") 4 else 3, contentHash = h)
    }
  }

  /** Batch decode: per-partition codec init + row loop — the Scala
    * analog of a Pandas-UDF `mapInPandas` batch (decoder opened once
    * per task, not per row).
    */
  def decodeFeatures(media: DataFrame, idCol: String, bytesCol: String): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), sniffFormat(col(bytesCol)), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = StubCodec.open() // once per partition/task
        rows.map { case (id, fmt, bytes) => codec.decode(id, fmt, bytes) }
      }
  }
}
