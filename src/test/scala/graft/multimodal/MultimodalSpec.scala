package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = (0 until 20)
    .map(i => (i.toLong, s"media-blob-content-$i".getBytes("UTF-8")))
    .toDF("id", "content")

  test("withMetadata: deterministic stub meta, stable across runs") {
    val rows = Multimodal.withMetadata(media, "id", "content")
    val m1 = rows.collect().map(r => r.id -> r.meta).toMap
    val m2 = Multimodal.withMetadata(media, "id", "content")
      .collect().map(r => r.id -> r.meta).toMap
    assert(m1 == m2) // pure function of content
    assert(m1.values.forall(m => m.width >= 0 && m.width < 1280))
    assert(m1.values.forall(m => m.height >= 0 && m.height < 720))
  }

  test("extractFeatures: fixed-dim embeddings feed Similarity ops") {
    val rows = Multimodal.withMetadata(media, "id", "content")
    val feats = Multimodal.extractFeatures(rows, dim = 16)
    val collected = feats.collect()
    assert(collected.length == 20)
    assert(collected.forall(_.embedding.length == 16))
    assert(collected.forall(_.frames >= 1))
    // embeddings are usable by the similarity operators
    val df = feats.toDF().select($"id", $"embedding")
    val knn = graft.operators.Similarity.bruteForceTopK(
      df.filter($"id" < 2), df, "id", "embedding", k = 3)
    assert(knn.count() == 6)
  }

  test("resizeAll: deterministic stub thumbnails sized to the target") {
    val rows = Multimodal.withMetadata(media, "id", "content")
    val small = Multimodal.resizeAll(rows, 64, 64).collect().toMap
    val large = Multimodal.resizeAll(rows, 256, 256).collect().toMap
    assert(small.keySet == (0L until 20L).toSet)
    assert(small.values.forall(_.length == 64 * 64 / 64))
    assert(large.values.forall(_.length == 256 * 256 / 64))
    // pure function of (content, target): rerun is byte-identical
    val again = Multimodal.resizeAll(rows, 64, 64).collect().toMap
    assert(small.keys.forall(k => small(k).sameElements(again(k))))
  }

  // -------------------------------------------- real JDK image decode

  /** A real 40×30 PNG: deterministic RGB gradient, encoded in-memory. */
  private def pngBytes(w: Int = 40, h: Int = 30, tint: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | (tint & 0xff))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoDecoder: real PNG meta through the Spark pipeline") {
    val imgs = (0 until 6).map(i => (i.toLong, pngBytes(40 + i, 30 + i, i * 40)))
      .toDF("id", "content")
    val rows = Multimodal.withMetadata(imgs, "id", "content",
      Multimodal.ImageIoDecoder).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.meta.mimeType == "image/png")
      assert(r.meta.width == 40 + r.id && r.meta.height == 30 + r.id)
      assert(r.meta.durationMs == 0L)
    }
  }

  test("ImageIoDecoder: resize output is itself a decodable image") {
    val imgs = Seq((1L, pngBytes())).toDF("id", "content")
    val rows = Multimodal.withMetadata(imgs, "id", "content",
      Multimodal.ImageIoDecoder)
    val thumb = Multimodal.resizeAll(rows, 16, 12, Multimodal.ImageIoDecoder)
      .collect().head._2
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    assert(back != null && back.getWidth == 16 && back.getHeight == 12)
  }

  test("ImageIoDecoder: luminance features are deterministic and discriminative") {
    val a = Multimodal.ImageIoDecoder.extractFeatures(pngBytes(), 16)
    val b = Multimodal.ImageIoDecoder.extractFeatures(pngBytes(), 16)
    assert(a.toSeq == b.toSeq) // pure function of the pixels
    assert(a.length == 16 && a.forall(v => v >= -1f && v <= 1f))
    assert(a.distinct.length > 1) // a gradient is not a constant vector
    // a darker image must yield a different fingerprint
    val dark = Multimodal.ImageIoDecoder.extractFeatures(pngBytes(40, 30, 0), 16)
    val lit = {
      val img = new java.awt.image.BufferedImage(40, 30,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 40; y <- 0 until 30) img.setRGB(x, y, 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      Multimodal.ImageIoDecoder.extractFeatures(out.toByteArray, 16)
    }
    assert(lit.forall(_ > 0.9f) && dark.exists(_ < 0.9f))
  }

  test("AutoDecoder: routes images to ImageIO, other bytes to the stub") {
    val png = pngBytes()
    assert(Multimodal.AutoDecoder.isImage(png))
    assert(!Multimodal.AutoDecoder.isImage("not-an-image-payload".getBytes))
    assert(Multimodal.AutoDecoder.decodeMeta(png).mimeType == "image/png")
    val other = Multimodal.AutoDecoder.decodeMeta("fake-video-bytes-123".getBytes)
    assert(other.mimeType == "application/x-stub") // stub fence for non-images
    // mixed-modality column through one Spark pass
    val mixed = Seq((1L, png), (2L, "opaque-video-blob".getBytes))
      .toDF("id", "content")
    val metas = Multimodal.withMetadata(mixed, "id", "content",
      Multimodal.AutoDecoder).collect().map(r => r.id -> r.meta.mimeType).toMap
    assert(metas(1L) == "image/png" && metas(2L) == "application/x-stub")
  }

  test("repartitionBySize balances partitions and preserves rows") {
    val out = Multimodal.repartitionBySize(media, "content",
      targetBytes = 64, partitions = 4)
    assert(out.count() == 20)
    assert(out.columns.toSeq == Seq("id", "content"))
    assert(out.rdd.getNumPartitions == 4)
  }

  private def sine16(n: Int, sr: Int, ch: Int)(sample: (Int, Int) => Int): Array[Byte] = {
    val pcm = new Array[Byte](n * ch * 2)
    for (i <- 0 until n; c <- 0 until ch) {
      val v = sample(i, c)
      val off = (i * ch + c) * 2
      pcm(off) = (v & 0xff).toByte
      pcm(off + 1) = ((v >> 8) & 0xff).toByte
    }
    WavDecoder.encodeWav(pcm, sr.toFloat, ch)
  }

  test("WavDecoder: meta mapping and exact PCM round-trip") {
    // stereo, 100 frames at 8 kHz: width=rate, height=channels
    val wav = sine16(100, 8000, 2)((i, c) => (i % 50) * 100 - 2000 + c)
    val meta = WavDecoder.decodeMeta(wav)
    assert(meta.mimeType == "audio/wav")
    assert(meta.width == 8000 && meta.height == 2)
    assert(meta.durationMs == 100L * 1000 / 8000)
    val chs = WavDecoder.decodeSamples(wav)
    assert(chs.length == 2 && chs(0).length == 100)
    // bit-exact de-interleave: every sample recovered
    for (i <- 0 until 100; c <- 0 until 2)
      assert(chs(c)(i) == (i % 50) * 100 - 2000 + c, s"($i,$c)")
  }

  test("WavDecoder: integer RMS and zero crossings match hand math") {
    // constant-magnitude alternating signal: RMS = |A| exactly, one
    // crossing per sign flip
    val wav = sine16(8, 8000, 1)((i, _) => if (i % 2 == 0) 300 else -300)
    val ch0 = WavDecoder.decodeSamples(wav)(0)
    assert(WavDecoder.intRms(ch0) == 300L)
    assert(WavDecoder.zeroCrossings(ch0) == 7L)
    // isqrt floors: samples 1,2,2 -> mean sq 3 -> isqrt 1
    assert(WavDecoder.intRms(Array(1, 2, 2)) == 1L)
    assert(WavDecoder.zeroCrossings(Array(5, 0, -5)) == 0L) // zero breaks the strict product
  }

  test("WavDecoder: frames and resize outputs are decodable WAVs") {
    val wav = sine16(1600, 8000, 1)((i, _) => if ((i / 4) % 2 == 0) 1000 else -1000)
    val frames = WavDecoder.sampleFrames(wav, everyMs = 50)
    assert(frames.size == 4) // 200 ms / 50 ms
    frames.foreach { f =>
      assert(WavDecoder.isWav(f))
      assert(WavDecoder.decodeSamples(f)(0).length == 400)
    }
    val small = WavDecoder.resize(wav, 100, 0)
    assert(WavDecoder.decodeSamples(small)(0).length == 100)
    // nearest-neighbor: values come from the source alphabet
    assert(WavDecoder.decodeSamples(small)(0).forall(v => v == 1000 || v == -1000))
  }

  test("AutoDecoder: RIFF/WAVE routes to the real audio decoder") {
    val wav = sine16(80, 8000, 1)((i, _) => i * 10)
    assert(WavDecoder.isWav(wav))
    val meta = Multimodal.AutoDecoder.decodeMeta(wav)
    assert(meta.mimeType == "audio/wav" && meta.width == 8000)
    // truncated/garbage RIFF still fences to the stub, not a crash
    val fake = "RIFFxxxxNOPE-not-audio".getBytes
    assert(!WavDecoder.isWav(fake))
    assert(Multimodal.AutoDecoder.decodeMeta(fake).mimeType == "application/x-stub")
  }
}
