package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK ISO-BMFF (MP4/MOV) CONTAINER parser: box walk over
  * `ftyp`/`moov`/`mvhd`/`trak`/`tkhd`/`mdia`/`hdlr`, extracting the
  * metadata a 100 TB video-corpus pipeline filters and routes on —
  * brand, duration, track count, display dimensions, handler types —
  * WITHOUT decoding a single frame. Frame decode needs codecs the JDK
  * does not ship (reference repo's media path assumes external
  * libraries; survey marks frame decode stub-only), but the container
  * layer is plain big-endian structs, so metadata extraction is fully
  * real: corpus triage (drop >N-minute clips, keep 16:9, split by
  * has-audio) runs on true parsed values at scale.
  *
  * Format notes (ISO/IEC 14496-12):
  *  - a box = u32 size (incl. header) + 4CC type; size 1 = u64
  *    largesize follows; size 0 = box extends to EOF
  *  - `mvhd` v0 carries u32 timescale + u32 duration (v1: u64
  *    duration); duration is in timescale units
  *  - `tkhd` width/height are 16.16 fixed point at the END of the box
  *  - `hdlr` handler_type 4CC at offset 8 of the box payload
  *    ("vide" video, "soun" audio, "text"/"subt" subtitles)
  *
  * Scale shape: a per-row projection over binary columns — embeds in
  * `mapPartitions` with zero shuffle; the parser reads only the boxes
  * it needs and never copies the payload (offset arithmetic over the
  * input array).
  */
object Mp4Parser {

  /** Parsed container metadata. `width`/`height` are the FIRST video
    * track's display size (0 when no video track); `handlers` is the
    * distinct handler 4CCs in file order. */
  case class Mp4Meta(majorBrand: String, timescale: Long, durationMs: Long,
                     nTracks: Int, width: Int, height: Int,
                     handlers: Seq[String])

  /** True when the bytes begin with a plausible `ftyp` box. */
  def isMp4(c: Array[Byte]): Boolean =
    c.length >= 12 && c(4) == 'f' && c(5) == 't' && c(6) == 'y' && c(7) == 'p'

  private def be32(c: Array[Byte], o: Int): Long =
    ((c(o) & 0xffL) << 24) | ((c(o + 1) & 0xffL) << 16) |
      ((c(o + 2) & 0xffL) << 8) | (c(o + 3) & 0xffL)

  private def be64(c: Array[Byte], o: Int): Long =
    (be32(c, o) << 32) | be32(c, o + 4)

  private def fourCC(c: Array[Byte], o: Int): String =
    new String(c, o, 4, "ISO-8859-1")

  /** (type, payloadStart, payloadEnd) for each box in [from, to). */
  private def boxes(c: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var o = from
    while (o + 8 <= to) {
      val size0 = be32(c, o)
      val typ = fourCC(c, o + 4)
      val (payload, end) =
        if (size0 == 1L && o + 16 <= to) (o + 16, o + be64(c, o + 8))
        else if (size0 == 0L) (o + 8, to.toLong) // box runs to EOF
        else (o + 8, o + size0)
      if (end < payload || end > to) return out.toSeq // corrupt size: stop loud-safe
      out += ((typ, payload, end.toInt))
      o = end.toInt
    }
    out.toSeq
  }

  /** Parse container metadata; None when the bytes are not ISO-BMFF
    * or lack a `moov` (fail explicit, never plausible zeros). */
  def parse(c: Array[Byte]): Option[Mp4Meta] = {
    if (!isMp4(c)) return None
    val top = boxes(c, 0, c.length)
    val brand = top.find(_._1 == "ftyp")
      .map { case (_, s, _) => fourCC(c, s) }.getOrElse(return None)
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    val inMoov = boxes(c, moov._2, moov._3)
    val (timescale, durationUnits) = inMoov.find(_._1 == "mvhd").map {
      case (_, s, _) =>
        val version = c(s) & 0xff
        if (version == 1) (be32(c, s + 20), be64(c, s + 24))
        else (be32(c, s + 12), be32(c, s + 16))
    }.getOrElse((0L, 0L))
    val traks = inMoov.filter(_._1 == "trak")
    var width = 0; var height = 0
    val handlers = scala.collection.mutable.LinkedHashSet.empty[String]
    traks.foreach { case (_, ts, te) =>
      val inTrak = boxes(c, ts, te)
      val handler = inTrak.find(_._1 == "mdia").flatMap { case (_, ms, me) =>
        boxes(c, ms, me).find(_._1 == "hdlr")
          .map { case (_, hs, _) => fourCC(c, hs + 8) }
      }
      handler.foreach(handlers += _)
      if (handler.contains("vide") && width == 0)
        inTrak.find(_._1 == "tkhd").foreach { case (_, ks, ke) =>
          // width/height are the final two 16.16 fields of the box
          width = (be32(c, ke - 8) >> 16).toInt
          height = (be32(c, ke - 4) >> 16).toInt
        }
    }
    val durMs = if (timescale == 0) 0L else durationUnits * 1000L / timescale
    Some(Mp4Meta(brand, timescale, durMs, traks.size, width, height,
      handlers.toSeq))
  }

  // ------------------------------------------------------------ fixture
  /** Minimal-but-valid MP4 container builder (the `encodeWav` cousin):
    * real box structure the parser — or any ISO-BMFF reader — walks.
    * Deterministic: byte-identical for identical arguments. */
  def encodeMp4(majorBrand: String, timescale: Long, durationUnits: Long,
                videoWH: Option[(Int, Int)], withAudio: Boolean,
                mvhdV1: Boolean = false): Array[Byte] = {
    require(majorBrand.length == 4, "brand must be a 4CC")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", majorBrand.getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0) ++ majorBrand.getBytes("ISO-8859-1"))
    val mvhd = if (mvhdV1) {
      val b = ByteBuffer.allocate(112).order(ByteOrder.BIG_ENDIAN)
      b.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
      b.putLong(0L).putLong(0L)                 // creation/modification
      b.putInt(timescale.toInt).putLong(durationUnits)
      b.array()
    } else {
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.put(0.toByte).put(Array[Byte](0, 0, 0))
      b.putInt(0).putInt(0)
      b.putInt(timescale.toInt).putInt(durationUnits.toInt)
      b.array()
    }
    def hdlr(h: String): Array[Byte] = box("hdlr", {
      val b = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0).putInt(0).put(h.getBytes("ISO-8859-1")).putInt(0).putInt(0).putInt(0)
      b.array()
    })
    def tkhd(w: Int, h: Int, id: Int): Array[Byte] = box("tkhd", {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.put(0.toByte).put(Array[Byte](0, 0, 7)) // enabled|in-movie|in-preview
      b.putInt(0).putInt(0).putInt(id).putInt(0).putInt(durationUnits.toInt)
      b.putLong(0L).putInt(0).putInt(0) // reserved ×2, layer+group, volume+pad
      // identity matrix (9 × 32-bit fixed)
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(w << 16).putInt(h << 16)
      b.array()
    })
    def trak(handler: String, wh: Option[(Int, Int)], id: Int): Array[Byte] =
      box("trak", tkhd(wh.map(_._1).getOrElse(0), wh.map(_._2).getOrElse(0), id) ++
        box("mdia", hdlr(handler)))
    val traks =
      videoWH.map(wh => trak("vide", Some(wh), 1)).toSeq ++
        (if (withAudio) Seq(trak("soun", None, 2)) else Seq.empty)
    ftyp ++ box("moov", box("mvhd", mvhd) ++ traks.flatten) ++
      box("mdat", Array.fill[Byte](16)(0))
  }
}
