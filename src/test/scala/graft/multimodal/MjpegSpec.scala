package graft.multimodal

import graft.SparkSpec

class MjpegSpec extends SparkSpec {
  import spark.implicits._

  /** Entropy-rich textured JPEG so the stream carries plenty of FF
    * bytes in compressed data — the case a naive FFD8 scan corrupts. */
  private def jpeg(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt(1 << 24))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("frameRanges: byte-exact round-trip through a concatenated stream") {
    val frames = Seq(jpeg(1, 48, 32), jpeg(2, 64, 48), jpeg(3, 80, 32))
    val stream = frames.reduce(_ ++ _)
    val ranges = Mjpeg.frameRanges(stream)
    assert(ranges.size == 3)
    val back = ranges.map { case (o, l) =>
      java.util.Arrays.copyOfRange(stream, o, o + l) }
    frames.zip(back).zipWithIndex.foreach { case ((a, b), i) =>
      assert(java.util.Arrays.equals(a, b), s"frame $i not byte-exact")
    }
  }

  test("sofDims parses planted dimensions from every frame") {
    val dims = Seq((48, 32), (64, 48), (80, 32))
    val stream = dims.zipWithIndex
      .map { case ((w, h), i) => jpeg(i + 10, w, h) }.reduce(_ ++ _)
    val got = Mjpeg.frameRanges(stream)
      .map { case (o, l) => Mjpeg.sofDims(stream, o, l) }
    assert(got == dims.map(Some(_)))
  }

  test("truncated and garbage streams stop clean") {
    val frames = Seq(jpeg(5, 48, 32), jpeg(6, 48, 32))
    val stream = frames.reduce(_ ++ _)
    // cut inside the second frame's entropy data
    val cut = java.util.Arrays.copyOfRange(stream, 0, stream.length - 10)
    assert(Mjpeg.frameRanges(cut).size == 1)
    assert(Mjpeg.frameRanges(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Mjpeg.frameRanges(Array.emptyByteArray).isEmpty)
  }

  test("explodeFrames: ids, indexes, counts, dims; decode composes") {
    val media = Seq(
      (1L, jpeg(21, 48, 32) ++ jpeg(22, 64, 48)),
      (2L, jpeg(23, 80, 32))).toDS()
    val rows = Mjpeg.explodeFrames(media)
      .as[(Long, Long, Long, Int, Int, Array[Byte])]
      .collect().sortBy(r => (r._1, r._2))
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq == Seq(
      (1L, 0L, 2L, 48, 32), (1L, 1L, 2L, 64, 48), (2L, 0L, 1L, 80, 32)))
    // every extracted frame must actually decode, at the SOF dims
    rows.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r._6))
      assert(img.getWidth == r._4 && img.getHeight == r._5)
    }
  }
}
