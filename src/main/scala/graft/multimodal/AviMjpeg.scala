package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK parser for MJPEG-in-AVI — the one video container that
  * needs NO native codec: an AVI is a RIFF chunk tree and each MJPEG
  * frame chunk ('##dc') is a complete JPEG the JDK's `javax.imageio`
  * already decodes. This closes the video branch of the
  * [[Multimodal.MediaCodec]] boundary for real (dimensions + frame
  * count from the 'avih' header, decodable frame bytes from 'movi'),
  * leaving only inter-frame-compressed codecs (H.264 et al.) to the
  * documented native-binding swap-in.
  *
  * The parser is defensive by construction — every size is bounds-
  * checked against the remaining buffer, so a truncated or hostile
  * payload returns None (the caller falls back to the stub) instead of
  * throwing or over-reading.
  */
object AviMjpeg {

  /** Header metadata + up to `maxFrames` leading frame payloads;
    * `totalFrames` counts EVERY frame chunk in the file, not just the
    * retained ones.
    */
  final case class AviInfo(width: Int, height: Int, totalFrames: Int,
      frames: Seq[Array[Byte]])

  private def fourcc(b: Array[Byte], pos: Int): String =
    new String(b, pos, 4, "US-ASCII")

  private def u32(b: Array[Byte], pos: Int): Long =
    ByteBuffer.wrap(b, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL

  /** True for '##dc'/'##db' stream-data chunk ids (digits + dc/db). */
  private def isFrameChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db"))

  def parse(bytes: Array[Byte], maxFrames: Int = 4): Option[AviInfo] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    var width = 0; var height = 0; var headerFrames = 0
    var frameCount = 0
    val frames = Seq.newBuilder[Array[Byte]]

    // depth-capped: a hostile payload nesting thousands of LISTs would
    // otherwise overflow the stack — an error NonFatal does NOT catch,
    // so it would kill the task instead of falling back to the stub.
    // Real AVIs nest 3-4 levels.
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return
      var pos = start
      while (pos + 8 <= end) {
        val id = fourcc(bytes, pos)
        val size = u32(bytes, pos + 4)
        val dataStart = pos + 8
        if (size > (end - dataStart).toLong) return // truncated/hostile
        val dataEnd = dataStart + size.toInt
        id match {
          case "LIST" if size >= 4 =>
            walk(dataStart + 4, dataEnd, depth + 1) // skip the list-type fourcc
          case "avih" if size >= 40 =>
            headerFrames = u32(bytes, dataStart + 16).toInt
            width = u32(bytes, dataStart + 32).toInt
            height = u32(bytes, dataStart + 36).toInt
          case other if isFrameChunk(other) =>
            frameCount += 1
            if (frameCount <= maxFrames)
              frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          case _ => ()
        }
        pos = dataEnd + (size.toInt & 1) // chunks pad to even offsets
      }
    }
    walk(12, bytes.length, 0)
    if (width <= 0 && frameCount == 0) None
    else Some(AviInfo(width, height,
      math.max(headerFrames, frameCount), frames.result()))
  }

  /** First frame decoded to pixels (None when absent/undecodable). */
  def firstFrameImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    parse(bytes, maxFrames = 1).flatMap(_.frames.headOption).flatMap { f =>
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
      catch { case scala.util.control.NonFatal(_) => None }
    }
}
