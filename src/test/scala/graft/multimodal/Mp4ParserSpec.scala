package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import Mp4Parser._

/** Box-walk parser vs the byte-exact fixture builder — and hostile
  * inputs: truncation, corrupt sizes, largesize boxes, non-BMFF bytes.
  * No Spark session needed; this layer is plain byte arithmetic. */
class Mp4ParserSpec extends AnyFunSuite {

  test("round-trip: brand, timescale, duration, tracks, dimensions, handlers") {
    val bytes = encodeMp4("isom", timescale = 600, durationUnits = 7200,
      videoWH = Some((1280, 720)), withAudio = true)
    val m = parse(bytes).get
    assert(m.majorBrand == "isom")
    assert(m.timescale == 600)
    assert(m.durationMs == 12000) // 7200/600 = 12 s
    assert(m.nTracks == 2)
    assert(m.width == 1280 && m.height == 720)
    assert(m.handlers == Seq("vide", "soun"))
  }

  test("mvhd version 1 (64-bit duration) parses identically") {
    val v0 = parse(encodeMp4("mp42", 1000, 90000, Some((640, 480)),
      withAudio = false)).get
    val v1 = parse(encodeMp4("mp42", 1000, 90000, Some((640, 480)),
      withAudio = false, mvhdV1 = true)).get
    assert(v0.durationMs == 90000 && v1.durationMs == 90000)
    assert(v0.timescale == v1.timescale)
    assert(v0.width == v1.width && v0.height == v1.height)
  }

  test("audio-only container: no dimensions, one soun handler") {
    val m = parse(encodeMp4("M4A ", 44100, 441000, None, withAudio = true)).get
    assert(m.nTracks == 1 && m.width == 0 && m.height == 0)
    assert(m.handlers == Seq("soun"))
    assert(m.durationMs == 10000)
  }

  test("duration math is integer (units*1000 div timescale)") {
    val m = parse(encodeMp4("isom", 600, 601, Some((16, 9)),
      withAudio = false)).get
    assert(m.durationMs == 601L * 1000L / 600L) // 1001, floor semantics
  }

  test("non-BMFF bytes (WAV, empty, garbage) parse to None, never zeros") {
    assert(parse(Array.empty[Byte]).isEmpty)
    assert(parse("RIFF....WAVEfmt ".getBytes("ISO-8859-1")).isEmpty)
    assert(parse(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("truncated container and corrupt box size fail safe, no exception") {
    val good = encodeMp4("isom", 600, 7200, Some((320, 240)), withAudio = false)
    // truncate inside moov: parser stops at the corrupt boundary
    val truncated = good.take(good.length / 2)
    parse(truncated) // must not throw
    // corrupt: moov's size points past EOF
    val corrupt = good.clone()
    val moovOff = {
      var o = 0; var found = -1
      while (found < 0 && o + 8 <= corrupt.length) {
        if (new String(corrupt, o + 4, 4, "ISO-8859-1") == "moov") found = o
        else o += java.nio.ByteBuffer.wrap(corrupt, o, 4).getInt
      }
      found
    }
    corrupt(moovOff) = 0x7f.toByte // absurd size
    parse(corrupt) // must not throw
  }

  test("largesize (size==1, u64) boxes walk correctly") {
    val inner = encodeMp4("isom", 600, 600, Some((100, 100)), withAudio = false)
    // rebuild the ftyp box as a largesize box: size=1 + u64 actual
    val ftypEnd = java.nio.ByteBuffer.wrap(inner, 0, 4).getInt
    val ftypPayload = inner.slice(8, ftypEnd)
    val b = java.nio.ByteBuffer.allocate(16 + ftypPayload.length)
    b.putInt(1).put("ftyp".getBytes("ISO-8859-1"))
      .putLong(16L + ftypPayload.length).put(ftypPayload)
    val rebuilt = b.array() ++ inner.drop(ftypEnd)
    val m = parse(rebuilt).get
    assert(m.majorBrand == "isom" && m.width == 100)
  }
}
