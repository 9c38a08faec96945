package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image dedup on a difference hash (dHash — public
  * technique): decode, integer luminance, 9×8 block grid, one bit per
  * horizontally adjacent block pair ("is the right block brighter?"),
  * 64 bits total. Exact-hash grouping then clusters re-encodes,
  * recompressions, and global brightness/exposure variants of the same
  * picture — the image-side analogue of text exact-dedup by
  * fingerprint (q21).
  *
  * Everything is INTEGER arithmetic on the decoded pixels, which makes
  * the hash provable and portable where float DCT pHash is not:
  * block comparisons are cross-multiplied sums
  * (`sum₁·n₂ > sum₂·n₁` — exact means comparison without division), so
  * a uniform luminance shift `+b` adds `b·n₁·n₂` to BOTH sides and
  * every bit is EXACTLY invariant, for any image size (the q102 oracle
  * replays the planted images' block sums in closed-form SQL and must
  * reproduce the hash bit-for-bit). Near-miss variants (crops, gamma)
  * need hamming-distance blocking — the SimHash pigeonhole machinery
  * (Dedup.simhashDuplicates) applies to these 64-bit hashes unchanged.
  *
  * Scale shape: hashing is mapPartitions over the (fanned-out) media
  * rows — CPU-bound per row, no shuffle; clustering is one groupBy on
  * the 64-bit hash. Decode happens ONCE per image (hash straight off
  * the BufferedImage, no feature detour).
  */
object ImageDedup {

  private val GridX = 9 // 9 block columns -> 8 horizontal compares
  private val GridY = 8

  /** (lo, hi) halves of the 64-bit dHash — two longs holding bits
    * 0–31 / 32–63, kept split so cross-engine oracles never hit
    * signed-64 overflow on the top bit. Throws on undecodable bytes
    * (route non-images through Multimodal.AutoDecoder first). */
  def dHash64(content: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "dHash64: undecodable image bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    // block sums of integer luminance (×1000: 299r+587g+114b) with
    // floor boundaries, plus per-block pixel counts for exact means
    val sums = Array.ofDim[Long](GridX, GridY)
    val counts = Array.ofDim[Long](GridX, GridY)
    var y = 0
    while (y < h) {
      val by = math.min(y * GridY / h, GridY - 1)
      var x = 0
      while (x < w) {
        val bx = math.min(x * GridX / w, GridX - 1)
        val rgb = img.getRGB(x, y)
        val lum = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        sums(bx)(by) += lum
        counts(bx)(by) += 1
        x += 1
      }
      y += 1
    }
    var lo = 0L
    var hi = 0L
    var byI = 0
    while (byI < GridY) {
      var bxI = 0
      while (bxI < GridX - 1) {
        val k = byI * (GridX - 1) + bxI
        // cross-multiplied mean compare: exact, division-free, and
        // uniform-shift invariant for ANY block sizes
        val bit = sums(bxI)(byI) * counts(bxI + 1)(byI) >
          sums(bxI + 1)(byI) * counts(bxI)(byI)
        if (bit) {
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        bxI += 1
      }
      byI += 1
    }
    (lo, hi)
  }

  /** (id, phash_lo, phash_hi) for every media row. CPU-heavy → fans
    * out to cluster parallelism instead of inheriting the input's
    * split count. */
  def perceptualHashes(media: DataFrame, idCol: String,
                       contentCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map { case (id, bytes) =>
        val (lo, hi) = dHash64(bytes)
        (id, lo, hi)
      })
      .toDF(idCol, "phash_lo", "phash_hi")
  }

  /** Cluster assignment by exact perceptual hash: every image joins
    * the cluster of the minimum id sharing its hash, with size and
    * the keep/drop verdict — same decision-table shape as
    * q97's text clusters. */
  def clusters(media: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val hashes = Materialize.once(perceptualHashes(media, idCol, contentCol))
    val groups = hashes.groupBy("phash_lo", "phash_hi")
      .agg(min(col(idCol)).as("cluster_id"), count(lit(1)).as("cluster_size"))
    hashes.join(groups, Seq("phash_lo", "phash_hi"))
      .select(col(idCol), col("phash_lo"), col("phash_hi"),
        col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }
}
