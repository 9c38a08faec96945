package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MJPEG (concatenated-JPEG) frame extraction — the one video FRAME
  * path that is feasible in the pure JDK (H.264+ decode is documented-
  * impossible without codecs, see [[Mp4Parser]]; MJPEG frames are
  * plain JPEGs `javax.imageio` decodes). The stream form handled here
  * is back-to-back JPEG images (the MJPEG-over-HTTP / AVI-payload
  * layout): each frame `FFD8 … FFD9`.
  *
  * The walk is STRUCTURAL, not a naive FFD8 scan: inside
  * entropy-coded data after SOS, `FF` bytes appear freely as stuffed
  * `FF00` and restart markers `FFD0–D7`, so a marker scan that does
  * not parse segment lengths would split frames mid-picture. This
  * walk parses every marker segment (big-endian lengths), skips
  * entropy data to the next true marker, and emits exact frame byte
  * ranges; any malformed structure stops the walk cleanly with the
  * frames found so far (the [[Mp3Parser]]/[[TarShards]] discipline).
  *
  * 100 TB shape: per-row imperative parsing in `mapPartitions` (the
  * multimodal-tier rule — binary decoding is genuinely per-partition
  * work); byte-balanced repartition upstream is the caller's job as
  * with [[Multimodal.withMetadata]].
  */
object Mjpeg {

  private def u8(b: Byte): Int = b & 0xff

  /** (offset, length) of each complete JPEG frame in `bytes`. */
  def frameRanges(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var o = 0
    while (o + 4 <= bytes.length &&
      u8(bytes(o)) == 0xff && u8(bytes(o + 1)) == 0xd8) {
      val start = o
      var p = o + 2
      var end = -1
      var bad = false
      while (end < 0 && !bad) {
        // expect a marker here
        if (p + 2 > bytes.length || u8(bytes(p)) != 0xff) bad = true
        else u8(bytes(p + 1)) match {
          case 0xd9 => end = p + 2 // EOI
          case 0xd8 => bad = true // nested SOI: malformed
          case 0x01 => p += 2 // standalone
          case m if m >= 0xd0 && m <= 0xd7 => p += 2 // RSTn standalone
          case 0xda => // SOS: header, then entropy data to next marker
            if (p + 4 > bytes.length) { bad = true }
            else {
              val len = (u8(bytes(p + 2)) << 8) | u8(bytes(p + 3))
              var q = p + 2 + len
              var found = -1
              while (found < 0 && q + 2 <= bytes.length) {
                if (u8(bytes(q)) == 0xff) {
                  val m2 = u8(bytes(q + 1))
                  if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) q += 2
                  else found = q
                } else q += 1
              }
              if (found < 0) bad = true else p = found
            }
          case _ => // length-bearing segment
            if (p + 4 > bytes.length) bad = true
            else {
              val len = (u8(bytes(p + 2)) << 8) | u8(bytes(p + 3))
              if (len < 2 || p + 2 + len > bytes.length) bad = true
              else p = p + 2 + len
            }
        }
      }
      if (end < 0) return out.toSeq // truncated/malformed: stop clean
      out += ((start, end - start))
      o = end
    }
    out.toSeq
  }

  /** (width, height) from the frame's SOF0/1/2 segment, or None. */
  def sofDims(bytes: Array[Byte], off: Int, len: Int): Option[(Int, Int)] = {
    var p = off + 2
    val stop = off + len
    while (p + 4 <= stop) {
      if (u8(bytes(p)) != 0xff) return None
      val m = u8(bytes(p + 1))
      if (m == 0xd9 || m == 0xda) return None // hit EOI/SOS before SOF
      val segLen = (u8(bytes(p + 2)) << 8) | u8(bytes(p + 3))
      if (segLen < 2 || p + 2 + segLen > stop) return None
      if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        if (segLen < 7) return None
        val h = (u8(bytes(p + 5)) << 8) | u8(bytes(p + 6))
        val w = (u8(bytes(p + 7)) << 8) | u8(bytes(p + 8))
        return Some((w, h))
      }
      p = p + 2 + segLen
    }
    None
  }

  /** Explode each (id, mjpegBytes) row into its frames:
    * (id, frame_idx, n_frames, width, height, frame) — width/height
    * from the SOF header walk (−1 when absent). */
  def explodeFrames(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { case (id, bytes) =>
      val ranges = frameRanges(bytes)
      ranges.zipWithIndex.map { case ((off, len), idx) =>
        val (w, h) = sofDims(bytes, off, len).getOrElse((-1, -1))
        (id, idx.toLong, ranges.size.toLong, w, h,
          java.util.Arrays.copyOfRange(bytes, off, off + len))
      }
    }.toDF("id", "frame_idx", "n_frames", "width", "height", "frame")
  }
}
