package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media payloads are opaque `binary` columns with typed
  * metadata; everything structural — format sniffing, byte features,
  * frame windowing, batch decode plumbing — is real Spark. Decode is a
  * pluggable `MediaCodec`: `JvmCodec` REALLY decodes the formats the
  * JDK ships codecs for (png/jpeg/gif/bmp via `javax.imageio`, wav via
  * `javax.sound.sampled` — zero new dependencies), `StubCodec` remains
  * the deterministic stand-in for containers that need native
  * libraries (video). Both share one signature, so swapping in a
  * JavaCV-style binding touches no plan shape.
  *
  * Scale notes: payload bytes ride the row (parquet binary column), so
  * partition sizing is byte-driven — size
  * `spark.sql.files.maxPartitionBytes` for media tables; decode runs
  * per-partition (`mapPartitions`) so codec init is amortized per task,
  * the same batch shape a Pandas-UDF `mapInPandas` would give PySpark.
  */
object Multimodal {

  /** Magic-byte prefixes for non-RIFF format sniffing. RIFF containers
    * (wav, avi) share the same leading fourcc and are discriminated by
    * the list type at byte offset 8 — see [[sniffFormat]].
    */
  val Magic: Seq[(String, Array[Byte])] = Seq(
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "png" -> Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte),
    "gif" -> "GIF8".getBytes("US-ASCII"),
    "mp3" -> "ID3".getBytes("US-ASCII"))

  /** Full 12-byte RIFF prefixes (size field zeroed) — fixture builders
    * for synthetic payloads that must sniff as wav/avi.
    */
  val RiffWavePrefix: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII")
  val RiffAviPrefix: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++ "AVI ".getBytes("US-ASCII")

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  /** Container-format sniff from leading magic bytes — pure codegen'd
    * expressions (hex + substring on binary), no UDF. RIFF containers
    * discriminate on the list type at bytes 9-12: WAVE → wav,
    * 'AVI ' → avi, anything else → the generic "riff".
    */
  def sniffFormat(bytes: Column): Column = {
    val riffKind =
      when(hex(substring(bytes, 9, 4)) === hexOf("WAVE".getBytes("US-ASCII")), lit("wav"))
        .when(hex(substring(bytes, 9, 4)) === hexOf("AVI ".getBytes("US-ASCII")), lit("avi"))
        .otherwise(lit("riff"))
    when(hex(substring(bytes, 1, 4)) === hexOf("RIFF".getBytes("US-ASCII")), riffKind)
      .otherwise(
        Magic.foldRight(lit("unknown"): Column) { case ((name, magic), acc) =>
          when(hex(substring(bytes, 1, magic.length)) === hexOf(magic), lit(name))
            .otherwise(acc)
        })
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

  /** REAL frame extraction from MJPEG-in-AVI payloads: one row per
    * retained frame `(idCol, frame_idx, frame_bytes)`, each a complete
    * JPEG — the vision-pipeline feed ([[ImageHash.imageHashes]] and
    * the JvmCodec image branch consume them directly, since a JPEG
    * frame sniffs as jpeg). Non-avi and unparseable payloads yield no
    * rows; `maxFrames` bounds the fan-out per video the way
    * [[sampleFrames]]'s `everyN` bounds the synthetic path.
    */
  def videoFrames(media: DataFrame, idCol: String, bytesCol: String,
      maxFrames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"), sniffFormat(col(bytesCol)), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap {
          case (id, "avi", bytes) =>
            AviMjpeg.parse(bytes, maxFrames).toSeq.flatMap(
              _.frames.zipWithIndex.map { case (f, i) => (id, i, f) })
          case _ => Nil
        }
      }
      .toDF(idCol, "frame_idx", "frame_bytes")
  }

  // ---------------------------------------------------------------------
  // Decode boundary
  // ---------------------------------------------------------------------

  /** Decoded-media feature record. For images: pixel dimensions +
    * color components. For audio (`JvmCodec` wav): `width` carries the
    * frame count and `height` the sample rate — the two axes an audio
    * pipeline windows on.
    */
  final case class MediaFeatures(
      mediaId: Long, format: String, nBytes: Long,
      width: Int, height: Int, channels: Int, contentHash: Long)

  /** The decode boundary: executor-side, opened once per task. */
  trait MediaCodec extends Serializable {
    /** Per-task init hook (native codecs allocate handles here). */
    def open(): MediaCodec = this
    def decode(id: Long, format: String, bytes: Array[Byte]): MediaFeatures
  }

  protected[multimodal] def contentHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** THE CODEC STUB — deterministic fake decode for containers with no
    * JDK codec (video). Derives plausible metadata purely from the
    * bytes so tests are reproducible anywhere; a real deployment swaps
    * in a JNI/Java binding (JavaCV et al.) with the same signature and
    * per-partition init pattern.
    */
  object StubCodec extends MediaCodec {
    def decode(id: Long, format: String, bytes: Array[Byte]): MediaFeatures = {
      val h = contentHash(bytes)
      val w = 16 + (math.abs(h) % 1024).toInt
      MediaFeatures(id, format, bytes.length.toLong,
        width = w, height = 16 + (math.abs(h >> 10) % 1024).toInt,
        channels = if (format == "png") 4 else 3, contentHash = h)
    }
  }

  /** REAL JDK-only decode — no external libraries: `javax.imageio`
    * reads png/jpeg/gif/bmp (pixel width/height + color components),
    * `javax.sound.sampled` reads wav (frame count, sample rate,
    * channels). Anything the JDK cannot decode (video containers,
    * corrupt payloads) falls back to the deterministic stub rather
    * than failing the partition — a 100 TB media scan must not die on
    * one truncated file.
    */
  object JvmCodec extends MediaCodec {
    def decode(id: Long, format: String, bytes: Array[Byte]): MediaFeatures = {
      try format match {
        case "png" | "jpeg" | "gif" | "bmp" =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) StubCodec.decode(id, format, bytes)
          else MediaFeatures(id, format, bytes.length.toLong,
            width = img.getWidth, height = img.getHeight,
            channels = img.getColorModel.getNumComponents,
            contentHash = contentHash(bytes))
        case "wav" =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            MediaFeatures(id, "wav", bytes.length.toLong,
              width = in.getFrameLength.toInt, height = fmt.getSampleRate.toInt,
              channels = fmt.getChannels, contentHash = contentHash(bytes))
          } finally in.close()
        case "avi" =>
          // MJPEG-in-AVI: header dims + frame count from 'avih', color
          // components from the first JPEG frame the JDK decodes
          AviMjpeg.parse(bytes, maxFrames = 1) match {
            case Some(info) =>
              // decode the already-extracted frame: re-parsing the
              // container here would walk the RIFF tree twice per row
              val firstFrame = info.frames.headOption.flatMap { f =>
                try Option(javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(f)))
                catch { case scala.util.control.NonFatal(_) => None }
              }
              val w = if (info.width > 0) info.width
                      else firstFrame.map(_.getWidth).getOrElse(0)
              val h = if (info.height > 0) info.height
                      else firstFrame.map(_.getHeight).getOrElse(0)
              if (w <= 0 || h <= 0) StubCodec.decode(id, format, bytes)
              else MediaFeatures(id, "avi", bytes.length.toLong,
                width = w, height = h,
                channels = firstFrame.map(_.getColorModel.getNumComponents).getOrElse(3),
                contentHash = contentHash(bytes))
            case None => StubCodec.decode(id, format, bytes)
          }
        case _ => StubCodec.decode(id, format, bytes)
      } catch {
        case scala.util.control.NonFatal(_) => StubCodec.decode(id, format, bytes)
      }
    }
  }

  /** Batch decode: per-partition codec init + row loop — the Scala
    * analog of a Pandas-UDF `mapInPandas` batch (decoder opened once
    * per task, not per row). Default codec stays the deterministic
    * stub (oracle-reproducible anywhere); pass `JvmCodec` for real
    * image/wav decoding.
    */
  def decodeFeatures(media: DataFrame, idCol: String, bytesCol: String,
      codecFactory: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), sniffFormat(col(bytesCol)), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = codecFactory.open() // once per partition/task
        rows.map { case (id, fmt, bytes) => codec.decode(id, fmt, bytes) }
      }
  }
}
