package graft.operators

import graft.SparkSpec

class RobustTrendSpec extends SparkSpec {
  import spark.implicits._

  private def fit(pts: Seq[(Long, Long)]) = {
    val r = RobustTrend.theilSen(pts.toDF("t", "v"), "t", "v").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("perfect line recovers slope and intercept exactly") {
    // v = 2t + 10 → every pairwise slope is 2·10⁶, intercept 10·10⁶
    assert(fit(Seq((0L, 10L), (1L, 12L), (2L, 14L), (3L, 16L))) ==
      (4L, 6L, 2000000L, 10000000L))
  }

  test("one wild outlier does not move the fit (breakdown robustness)") {
    // 4 points on v = 2t + 10, one corrupted to 1000: the 4 clean-pair
    // slopes (2·10⁶) still hold the rank-5 median of the 10 pairs, and
    // the median residual ignores the outlier row
    assert(fit(Seq((0L, 10L), (1L, 12L), (2L, 14L), (3L, 16L), (4L, 1000L))) ==
      (5L, 10L, 2000000L, 10000000L))
  }

  test("negative slope floors toward -inf, not toward zero") {
    // slope −10⁶/3: truncation gives −333333, floor must give −333334
    val (_, _, slope, _) = fit(Seq((0L, 0L), (3L, -1L)))
    assert(slope == -333334L)
  }

  test("lower-median tie break matches the type-1 rank rule") {
    // 3 points → 3 pairs, median = rank ceil(3/2) = 2 of sorted slopes
    // slopes: (0,0)→(1,1): 10⁶; (1,1)→(2,4): 3·10⁶; (0,0)→(2,4): 2·10⁶
    val (_, np, slope, _) = fit(Seq((0L, 0L), (1L, 1L), (2L, 4L)))
    assert(np == 3L && slope == 2000000L)
  }

  test("duplicate t values fail loudly") {
    val e = intercept[IllegalArgumentException] {
      fit(Seq((0L, 1L), (0L, 2L), (1L, 3L)))
    }
    assert(e.getMessage.contains("duplicate t"))
  }

  test("partitioning invariance") {
    val pts = (0L until 60L).map(t => (t, t * 3 + (t % 7) - 40L))
    val one = fit(pts)
    val r = RobustTrend.theilSen(
      pts.toDF("t", "v").repartition(11), "t", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == one)
  }
}
