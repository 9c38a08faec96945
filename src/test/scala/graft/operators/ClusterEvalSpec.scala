package graft.operators

import graft.SparkSpec

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private def sil(rows: Seq[(Long, Seq[Long])]) =
    ClusterEval.simplifiedSilhouette(
      rows.toDF("label", "qv"), "label", "qv")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

  test("well-separated 1-D clusters score near +10^6, hand-exact") {
    // centroids: a → floorDiv(0+10, 2) = 5; b → 105
    // point 0:   a = 25, b = 11025 → (11000·10⁶) div 11025 = 997732
    // point 10:  a = 25, b =  9025 → (9000·10⁶)  div 9025  = 997229
    val out = sil(Seq(
      (1L, Seq(0L)), (1L, Seq(10L)), (2L, Seq(100L)), (2L, Seq(110L))))
    assert(out(1L) == ((2L, 997732L + 997229L, 997480L, 0L)))
    assert(out(2L) == ((2L, 997229L + 997732L, 997480L, 0L)))
  }

  test("a mislabeled point goes negative and is counted") {
    // label a = {0, 100} (centroid 50), label b = {102, 110}
    // (centroid 106): the point 100 sits on b's doorstep —
    // a = 2500, b = 36 → s = (36−2500)·10⁶ div 2500 = −985600
    val out = sil(Seq(
      (1L, Seq(0L)), (1L, Seq(100L)), (2L, Seq(102L)), (2L, Seq(110L))))
    assert(out(1L)._4 == 1L)
    // the mean is the floor of sum/n even when the sum is negative
    val (n, sum, mean, _) = out(1L)
    assert(mean == Math.floorDiv(sum, n))
  }

  test("a singleton cluster at its own centroid scores +10^6") {
    val out = sil(Seq(
      (1L, Seq(7L, -3L)), (2L, Seq(100L, 100L)), (2L, Seq(104L, 100L))))
    assert(out(1L) == ((1L, 1000000L, 1000000L, 0L)))
  }

  test("fewer than two labels fails loudly") {
    val e = intercept[IllegalArgumentException] {
      sil(Seq((1L, Seq(0L)), (1L, Seq(1L))))
    }
    assert(e.getMessage.contains("2 labels"))
  }

  test("partitioning invariance on a multi-dim fixture") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 90).map { i =>
      val l = (i % 3).toLong
      (l, Seq.tabulate(8)(d => l * 1000L + rnd.nextInt(200) - 100L + d))
    }
    val one = sil(rows)
    val many = ClusterEval.simplifiedSilhouette(
      rows.toDF("label", "qv").repartition(13), "label", "qv")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(one == many)
  }
}
