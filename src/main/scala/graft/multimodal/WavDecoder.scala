package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio decode on the pure-JDK codec: `javax.sound.sampled`
  * reads/writes RIFF/WAV (PCM) with zero external jars — the same
  * trick [[Multimodal.ImageIoDecoder]] uses for PNG/JPEG. This closes
  * the "audio is a stub" boundary for the one container the JDK
  * actually ships a codec for; compressed formats (MP3/AAC/Opus)
  * still route to [[Multimodal.StubDecoder]] until a real codec is
  * linked in production.
  *
  * [[Multimodal.MediaMeta]] field mapping for audio (documented
  * contract, asserted in MultimodalSpec): `width` = sample rate in
  * Hz, `height` = channel count, `durationMs` = frames·1000/rate.
  *
  * Feature math is INTEGER so downstream checks are engine-portable:
  * per-channel RMS is `isqrt(Σs² div n)` (BigInt sum — no overflow,
  * no float accumulation order), zero crossings count strict sign
  * products `s[i-1]·s[i] < 0`. Supported encodings: 8/16-bit PCM
  * (signed or unsigned), mono or interleaved multi-channel.
  */
object WavDecoder extends Multimodal.Decoder {
  import Multimodal.MediaMeta

  private[multimodal] def isWav(c: Array[Byte]): Boolean =
    c.length >= 12 &&
      c(0) == 'R' && c(1) == 'I' && c(2) == 'F' && c(3) == 'F' &&
      c(8) == 'W' && c(9) == 'A' && c(10) == 'V' && c(11) == 'E'

  /** Encode interleaved PCM into a RIFF/WAV container (16-bit
    * little-endian signed unless `bits` says otherwise). The inverse
    * of [[decodeSamples]]; synthesis entry point for planted-waveform
    * tests and the resample/frame-split paths. */
  def encodeWav(pcm: Array[Byte], sampleRate: Float, channels: Int,
                bits: Int = 16): Array[Byte] = {
    require(bits == 8 || bits == 16, s"PCM bits must be 8 or 16: $bits")
    val bytesPerFrame = channels * bits / 8
    require(pcm.length % bytesPerFrame == 0,
      s"PCM length ${pcm.length} not a multiple of frame size $bytesPerFrame")
    val fmt = new AudioFormat(sampleRate, bits, channels,
      /* signed = */ bits == 16, /* bigEndian = */ false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      pcm.length / bytesPerFrame)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def stream(content: Array[Byte]): AudioInputStream =
    try AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
    catch {
      case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          "bytes not decodable by javax.sound.sampled", e)
    }

  /** Decode to per-channel integer samples (outer index = channel).
    * 8-bit WAV is unsigned per the RIFF spec — recentred to signed;
    * 16-bit is little-endian signed. */
  def decodeSamples(content: Array[Byte]): Array[Array[Int]] = {
    val in = stream(content)
    try {
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16, s"unsupported PCM depth: $bits")
      val ch = fmt.getChannels
      val bytes = in.readAllBytes()
      val bytesPerFrame = ch * bits / 8
      val n = bytes.length / bytesPerFrame
      val out = Array.ofDim[Int](ch, n)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < ch) {
          val off = i * bytesPerFrame + c * bits / 8
          out(c)(i) =
            if (bits == 16) // little-endian signed
              ((bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)).toShort.toInt
            else (bytes(off) & 0xff) - 128 // unsigned byte, recentre
          c += 1
        }
        i += 1
      }
      out
    } finally in.close()
  }

  /** Integer RMS: `isqrt(Σs² div n)` — BigInt sum (order-independent,
    * unbounded), floor division, exact integer square root. Empty
    * channel → 0. */
  def intRms(samples: Array[Int]): Long = {
    if (samples.isEmpty) return 0L
    var sum = BigInt(0)
    var i = 0
    while (i < samples.length) {
      val s = BigInt(samples(i))
      sum += s * s
      i += 1
    }
    (sum / samples.length).bigInteger.sqrt().longValueExact()
  }

  /** Strict sign-flip count: positions i ≥ 1 with s[i-1]·s[i] < 0.
    * A zero sample never counts (and resets nothing — the next
    * nonzero pair decides on its own). */
  def zeroCrossings(samples: Array[Int]): Long = {
    var n = 0L
    var i = 1
    while (i < samples.length) {
      if (samples(i - 1).toLong * samples(i) < 0L) n += 1
      i += 1
    }
    n
  }

  def decodeMeta(content: Array[Byte]): MediaMeta = {
    val in = stream(content)
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      MediaMeta("audio/wav", fmt.getSampleRate.toInt, fmt.getChannels,
        frames * 1000L / fmt.getSampleRate.toInt)
    } finally in.close()
  }

  /** `dim` RMS-envelope cells over channel 0, scaled to [0, 1): the
    * no-model audio fingerprint (loudness contour), the audio twin of
    * ImageIoDecoder's luminance grid. */
  def extractFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    val ch0 = decodeSamples(content)(0)
    val n = math.max(1, ch0.length)
    Array.tabulate(dim) { i =>
      val lo = (i.toLong * n / dim).toInt
      val hi = math.max(lo + 1, ((i + 1).toLong * n / dim).toInt)
      (intRms(java.util.Arrays.copyOfRange(ch0, lo, math.min(hi, ch0.length)))
        .toFloat / 32768f)
    }
  }

  /** Split into `everyMs` windows, each re-encoded as a standalone WAV
    * (decodable by this same object) — capped at 32 like the stub. */
  def sampleFrames(content: Array[Byte], everyMs: Long): Seq[Array[Byte]] = {
    val in = stream(content)
    val (fmt, bytes) = try (in.getFormat, in.readAllBytes()) finally in.close()
    val bytesPerFrame = fmt.getChannels * fmt.getSampleSizeInBits / 8
    val framesPerWin =
      math.max(1L, fmt.getSampleRate.toLong * math.max(1L, everyMs) / 1000L)
    val bytesPerWin = (framesPerWin * bytesPerFrame).toInt
    val nWin = math.min(32L,
      (bytes.length + bytesPerWin - 1L) / bytesPerWin).toInt
    (0 until nWin).map { w =>
      val lo = w * bytesPerWin
      val hi = math.min(bytes.length, lo + bytesPerWin)
      // trim to whole frames, then re-wrap
      val len = (hi - lo) / bytesPerFrame * bytesPerFrame
      encodeWav(java.util.Arrays.copyOfRange(bytes, lo, lo + len),
        fmt.getSampleRate, fmt.getChannels, fmt.getSampleSizeInBits)
    }
  }

  /** Audio "resize" = nearest-neighbor resample to `width` frames per
    * channel at the SAME declared rate (time-stretch to the target
    * length, the thumbnail analogue); `height` is ignored for audio. */
  def resize(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width >= 1, s"target frames must be >= 1: $width")
    val chs = decodeSamples(content)
    val in = stream(content)
    val fmt = try in.getFormat finally in.close()
    val srcN = chs(0).length
    val ch = chs.length
    val pcm = new Array[Byte](width * ch * 2)
    var i = 0
    while (i < width) {
      val src = if (srcN == 0) 0 else math.min(srcN - 1,
        (i.toLong * srcN / width).toInt)
      var c = 0
      while (c < ch) {
        val v = if (srcN == 0) 0 else chs(c)(src)
        val off = (i * ch + c) * 2
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    encodeWav(pcm, fmt.getSampleRate, ch)
  }
}
