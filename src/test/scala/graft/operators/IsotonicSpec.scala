package graft.operators

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(pts: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] =
    Isotonic.pavFit(pts.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("known hand case: single violator pools with its neighbor") {
    // means by x: 1→0, 2→1, 3→0.5, 4→1  ⇒ x=2 (1/1) and x=3 (1/2)
    // violate and pool to 2/3 = 666666 ppm; x=1 and x=4 stand alone
    val pts = Seq((1L, 0L), (2L, 1L), (3L, 0L), (3L, 1L), (4L, 1L))
    assert(fit(pts) == Seq(
      (1L, 1L, 0L, 0L), (2L, 1L, 1L, 666666L),
      (3L, 2L, 1L, 666666L), (4L, 1L, 1L, 1000000L)))
  }

  test("already-isotonic input is returned block-per-point") {
    val pts = (1L to 20L).flatMap(x => Seq((x, x / 4), (x, x / 4)))
    val got = fit(pts)
    assert(got.map(_._1) == (1L to 20L))
    assert(got.forall { case (x, n, s, f) =>
      n == 2 && s == 2 * (x / 4) && f == (x / 4) * 1000000L })
  }

  test("strictly decreasing input pools to one global block") {
    val pts = (1L to 10L).map(x => (x, 100L - x))
    val got = fit(pts)
    val mean = pts.map(_._2).sum * 1000000L / 10
    assert(got.forall(_._4 == mean))
  }

  test("fit ≡ independent min-max formula on random 0/1 data") {
    val rnd = new scala.util.Random(17)
    val pts = (1 to 3000).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(2).toLong))
    val got = fit(pts)
    assert(got.map(_._4) == got.map(_._4).sorted, "monotone")
    assert(got.map(_._2).sum == 3000L && got.map(_._3).sum == pts.map(_._2).sum)
    // the isotonic L2 fit has the closed form
    //   fit(i) = max_{j<=i} min_{k>=i} mean(y over points j..k)
    // — an algorithm-independent cross-check, exact via BigInt fracs
    val hist = pts.groupBy(_._1).toSeq.sortBy(_._1).map { case (x, g) =>
      (x, BigInt(g.length), BigInt(g.map(_._2).sum)) }
    def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)) = a._1 * b._2 < b._1 * a._2
    val expected = hist.indices.map { i =>
      val cands = (0 to i).map { j =>
        (j to hist.length - 1).filter(_ >= i).map { k =>
          val seg = hist.slice(j, k + 1)
          (seg.map(_._3).sum, seg.map(_._2).sum)
        }.reduceLeft((a, b) => if (lt(b, a)) b else a)
      }.reduceLeft((a, b) => if (lt(a, b)) b else a)
      (hist(i)._1, (cands._1 * 1000000 / cands._2).toLong)
    }
    assert(got.map(r => (r._1, r._4)) == expected)
  }

  test("nulls dropped; negative y sums rejected") {
    // surviving points: (1,1) and (2,0) — means 1 then 0 violate and
    // pool to 1/2 across both
    val df = Seq((Some(1L), Some(1L)), (Some(1L), None), (None, Some(1L)),
      (Some(2L), Some(0L))).toDF("x", "y")
    assert(Isotonic.pavFit(df, "x", "y").as[(Long, Long, Long, Long)]
      .collect().toSeq == Seq((1L, 1L, 1L, 500000L), (2L, 1L, 0L, 500000L)))
    intercept[IllegalArgumentException] {
      Isotonic.pavFit(Seq((1L, -5L)).toDF("x", "y"), "x", "y")
    }
  }
}
