package graft.multimodal

/** Pure-JDK MPEG-1 Layer III (MP3) FRAME-HEADER walk — the audio
  * cousin of [[Mp4Parser]]: no codec, no samples, just the 4-byte
  * frame headers every MP3 carries, which is all a corpus pipeline
  * needs to route on (true duration, sample rate, channel count,
  * CBR/VBR, bitrate ceiling) and to reject truncated/corrupt files
  * before they reach a real decoder fleet.
  *
  * Format (ISO/IEC 11172-3): a frame header is 11 sync bits + version
  * + layer + bitrate/samplerate indices + padding + channel mode;
  * Layer III frame length = 144·bitrate/samplerate + padding bytes,
  * and each frame decodes 1152 samples — so duration falls out of a
  * header WALK with no payload inspection. An optional ID3v2 tag
  * (10-byte header, syncsafe 28-bit size) precedes frame 0.
  *
  * Scope: MPEG-1 Layer III only (the overwhelming corpus majority);
  * anything else returns None — fail explicit, never plausible zeros.
  * Scale shape: per-row byte arithmetic, zero shuffle.
  */
object Mp3Parser {

  /** kbps by bitrate index 1..14, MPEG-1 Layer III. */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Hz by samplerate index 0..2, MPEG-1. */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  private val SamplesPerFrame = 1152

  case class Mp3Meta(nFrames: Int, sampleRateHz: Int, channels: Int,
                     maxKbps: Int, vbr: Boolean, durationMs: Long,
                     id3Bytes: Int)

  private def u(b: Byte): Int = b & 0xff

  /** ID3v2 prefix length (0 when absent): "ID3" + 2 version bytes +
    * flags + 4 syncsafe size bytes, size EXCLUDING the 10-byte header. */
  private[multimodal] def id3Length(c: Array[Byte]): Int =
    if (c.length >= 10 && c(0) == 'I' && c(1) == 'D' && c(2) == '3') {
      val size = (u(c(6)) << 21) | (u(c(7)) << 14) | (u(c(8)) << 7) | u(c(9))
      10 + size
    } else 0

  /** Walk every frame; None unless the bytes open (after any ID3v2)
    * with a valid MPEG-1 Layer III header. A malformed mid-stream
    * header stops the walk (truncation-safe) rather than throwing. */
  def parse(c: Array[Byte]): Option[Mp3Meta] = {
    val start = id3Length(c)
    var o = start
    var n = 0; var sr = -1; var channels = -1
    var maxKbps = 0; var minKbps = Int.MaxValue
    while (o + 4 <= c.length &&
      u(c(o)) == 0xff && (u(c(o + 1)) & 0xfe) == 0xfa) { // MPEG1 Layer III
      val bIdx = (u(c(o + 2)) >> 4) & 0xf
      val sIdx = (u(c(o + 2)) >> 2) & 0x3
      val pad = (u(c(o + 2)) >> 1) & 0x1
      val mode = (u(c(o + 3)) >> 6) & 0x3
      if (bIdx < 1 || bIdx > 14 || sIdx > 2) return finish(n, sr, channels, maxKbps, minKbps, start)
      val hz = SampleRateHz(sIdx)
      if (sr == -1) sr = hz else if (sr != hz) return finish(n, sr, channels, maxKbps, minKbps, start)
      val ch = if (mode == 3) 1 else 2
      if (channels == -1) channels = ch
      val kbps = BitrateKbps(bIdx)
      maxKbps = math.max(maxKbps, kbps); minKbps = math.min(minKbps, kbps)
      val len = 144000 * kbps / hz + pad
      if (len < 4 || o + len > c.length) // malformed or truncated frame
        return finish(n, sr, channels, maxKbps, minKbps, start)
      n += 1
      o += len
    }
    finish(n, sr, channels, maxKbps, minKbps, start)
  }

  private def finish(n: Int, sr: Int, channels: Int, maxKbps: Int,
                     minKbps: Int, id3: Int): Option[Mp3Meta] =
    if (n == 0) None
    else Some(Mp3Meta(n, sr, channels, maxKbps, vbr = maxKbps != minKbps,
      durationMs = n.toLong * SamplesPerFrame * 1000L / sr, id3Bytes = id3))

  // ------------------------------------------------------------ fixture
  /** Valid MPEG-1 Layer III container builder: real headers, zeroed
    * payloads, optional ID3v2 prefix. Deterministic. */
  def encodeMp3(bitrateIndices: Seq[Int], srIdx: Int, mono: Boolean,
                id3PayloadBytes: Int = 0): Array[Byte] = {
    require(bitrateIndices.nonEmpty &&
      bitrateIndices.forall(i => i >= 1 && i <= 14), "bitrate idx in 1..14")
    require(srIdx >= 0 && srIdx <= 2, "samplerate idx in 0..2")
    require(id3PayloadBytes >= 0 && id3PayloadBytes < (1 << 28))
    val out = new java.io.ByteArrayOutputStream()
    if (id3PayloadBytes > 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write((id3PayloadBytes >> 21) & 0x7f); out.write((id3PayloadBytes >> 14) & 0x7f)
      out.write((id3PayloadBytes >> 7) & 0x7f); out.write(id3PayloadBytes & 0x7f)
      out.write(new Array[Byte](id3PayloadBytes))
    }
    bitrateIndices.foreach { bIdx =>
      val hz = SampleRateHz(srIdx)
      val len = 144000 * BitrateKbps(bIdx) / hz // padding 0
      out.write(0xff); out.write(0xfb) // sync + MPEG1 + Layer III + no CRC
      out.write((bIdx << 4) | (srIdx << 2))
      out.write(if (mono) 0xc0 else 0x00)
      out.write(new Array[Byte](len - 4))
    }
    out.toByteArray
  }
}
