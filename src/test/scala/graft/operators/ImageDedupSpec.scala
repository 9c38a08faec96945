package graft.operators

import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(lum: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("dHash is EXACTLY invariant to uniform brightness shifts") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val w = 20 + rnd.nextInt(80) // deliberately not divisible by 9
      val h = 20 + rnd.nextInt(60)
      val base = Array.fill(w * h)(40 + rnd.nextInt(160))
      val orig = ImageDedup.dHash64(png(w, h)((x, y) => base(y * w + x)))
      for (shift <- Seq(-30, -5, 11, 40)) {
        val shifted = ImageDedup.dHash64(
          png(w, h)((x, y) => base(y * w + x) + shift))
        assert(shifted == orig, s"hash moved under shift=$shift ($w x $h)")
      }
    }
  }

  test("different textures hash differently; identical bytes identically") {
    val a = ImageDedup.dHash64(png(72, 64)((x, y) => 60 + (x * 7 + y * 13) % 120))
    val b = ImageDedup.dHash64(png(72, 64)((x, y) => 60 + (x * 11 + y * 3) % 120))
    val a2 = ImageDedup.dHash64(png(72, 64)((x, y) => 60 + (x * 7 + y * 13) % 120))
    assert(a != b)
    assert(a == a2)
  }

  test("clusters group exposure variants and keep the minimum id") {
    val media = (0L until 30L).map { id =>
      val g = id / 10
      (id, png(72, 64)((x, y) =>
        (60 + (g * 31 + x * 7 + y * 13) % 120 + (id % 10)).toInt))
    }.toDF("doc_id", "content")
    val out = ImageDedup.clusters(media, "doc_id", "content")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length == 30)
    for ((id, cid, size, canon) <- out) {
      assert(cid == (id / 10) * 10, s"doc $id joined cluster $cid")
      assert(size == 10)
      assert(canon == (id % 10 == 0))
    }
  }

  test("nearDuplicatePairs: complete vs brute-force popcount, sound at the cutoff") {
    // 12 images: 4 base textures x (base, one-block bump, two-block
    // bump) — localized edits that flip a few dHash bits each
    val media = (0L until 12L).map { id =>
      val g = id / 3
      val variant = (id % 3).toInt
      (id, png(72, 64) { (x, y) =>
        val bumped = (variant >= 1 && x / 8 == 2 && y / 8 == 3) ||
          (variant == 2 && x / 8 == 5 && y / 8 == 1)
        (60 + (g * 37 + x * 7 + y * 13) % 120 + (if (bumped) 50 else 0)).toInt
      })
    }.toDF("doc_id", "content")
    val maxH = 4
    val got = ImageDedup.nearDuplicatePairs(media, "doc_id", "content", maxH)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    // brute force over the same hashes
    val hs = ImageDedup.perceptualHashes(media, "doc_id", "content")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = (for {
      (ia, la, ha) <- hs; (ib, lb, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
      if d <= maxH
    } yield (ia, ib, d)).toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
    // the fixture actually exercises the near-miss band: some planted
    // pair is within (0, maxH] — not everything collapsed to exact
    assert(expect.exists { case (_, _, d) => d > 0 },
      "fixture degenerated to exact duplicates only")
    // a radius beyond the pigeonhole guarantee is rejected loudly
    intercept[IllegalArgumentException] {
      ImageDedup.nearDuplicatePairs(media, "doc_id", "content", maxHamming = 8)
    }
  }

  test("hashing is invariant to input partitioning") {
    val media = (0L until 20L).map { id =>
      (id, png(45, 33)((x, y) => (50 + (id / 5 * 17 + x * 3 + y * 5) % 150).toInt))
    }
    val a = ImageDedup.perceptualHashes(media.toDF("id", "content"), "id", "content")
      .as[(Long, Long, Long)].collect().toSet
    val b = ImageDedup.perceptualHashes(
      media.toDF("id", "content").repartition(7), "id", "content")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
