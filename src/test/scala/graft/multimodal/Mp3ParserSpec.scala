package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import Mp3Parser._

class Mp3ParserSpec extends AnyFunSuite {

  test("round-trip: frames, samplerate, channels, CBR bitrate, duration") {
    val bytes = encodeMp3(Seq.fill(10)(9), srIdx = 0, mono = false) // 128 kbps
    val m = parse(bytes).get
    assert(m.nFrames == 10 && m.sampleRateHz == 44100 && m.channels == 2)
    assert(m.maxKbps == 128 && !m.vbr)
    assert(m.durationMs == 10L * 1152 * 1000 / 44100) // 261 ms
    assert(m.id3Bytes == 0)
  }

  test("VBR stream reports the bitrate ceiling and the vbr flag") {
    val m = parse(encodeMp3(Seq(1, 14, 5, 14, 1), srIdx = 1, mono = true)).get
    assert(m.vbr && m.maxKbps == 320 && m.channels == 1)
    assert(m.sampleRateHz == 48000)
  }

  test("ID3v2 prefix is skipped and measured (syncsafe size)") {
    val plain = encodeMp3(Seq(5, 5), srIdx = 2, mono = false)
    val tagged = encodeMp3(Seq(5, 5), srIdx = 2, mono = false,
      id3PayloadBytes = 1000)
    val a = parse(plain).get; val b = parse(tagged).get
    assert(a.copy(id3Bytes = 0) == b.copy(id3Bytes = 0))
    assert(b.id3Bytes == 1010)
    // syncsafe: a size crossing a 7-bit boundary
    val big = parse(encodeMp3(Seq(5), 0, mono = true,
      id3PayloadBytes = 200)).get
    assert(big.id3Bytes == 210)
  }

  test("truncated stream stops at the cut, earlier frames still counted") {
    val full = encodeMp3(Seq.fill(6)(9), srIdx = 0, mono = false)
    val frameLen = 144000 * 128 / 44100
    val cut = full.take(frameLen * 3 + 10) // mid-4th-frame
    val m = parse(cut).get
    assert(m.nFrames == 3)
  }

  test("non-MP3 bytes (WAV, MP4, garbage, empty) parse to None") {
    assert(parse(Array.empty[Byte]).isEmpty)
    assert(parse("RIFF....WAVEfmt ".getBytes("ISO-8859-1")).isEmpty)
    assert(parse(Mp4Parser.encodeMp4("isom", 600, 600, None,
      withAudio = true)).isEmpty)
    assert(parse(Array.fill[Byte](100)(0x55)).isEmpty)
  }

  test("free/bad bitrate index and reserved samplerate reject the frame") {
    // craft a header with bitrate index 0 (free) — parser must not loop
    val bad = Array[Byte](0xff.toByte, 0xfb.toByte, 0x00, 0x00)
    assert(parse(bad).isEmpty)
    val reserved = Array[Byte](0xff.toByte, 0xfb.toByte, (9 << 4 | 3 << 2).toByte, 0x00)
    assert(parse(reserved).isEmpty)
  }
}
