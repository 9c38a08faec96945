package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, ox, oy) =>
        ox <= x && oy <= y && (ox < x || oy < y)
      }
    }.toSet

  test("skyline ≡ NOT EXISTS brute force across bucket widths") {
    val rnd = new scala.util.Random(31)
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = pts.toDF("id", "x", "y")
    val expected = brute(pts)
    for (w <- Seq(1L, 13L, 100L, 100000L)) {
      val got = Skyline.skyline2d(df, "x", "y", w)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"bucketWidth=$w")
    }
  }

  test("anticorrelated chain: every point survives") {
    val pts = (0 until 50).map(i => (i.toLong, i.toLong, (100 - i).toLong))
    val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y", 7L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == pts.toSet)
  }

  test("duplicate points both survive; dominated duplicates both drop") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 9L, 9L), (4L, 9L, 9L),
      (5L, 5L, 9L), (6L, 9L, 5L))
    val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y", 3L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 5L, 5L), (2L, 5L, 5L)))
  }
}
