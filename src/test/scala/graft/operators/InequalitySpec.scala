package graft.operators

import graft.SparkSpec

class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def conc(rows: Seq[(String, Long)]) =
    Inequality.concentration(rows.toDF("k", "x").repartition(5), "k", "x")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head

  test("perfect equality scores gini 0; HHI = 1/n; top share = 1/n") {
    val (n, total, gini, hhi, top) =
      conc((1 to 8).map(i => s"k$i" -> 100L))
    assert(n == 8 && total == 800)
    assert(gini.contains(0L))
    assert(hhi.contains(125000L)) // 1/8 in ppm
    assert(top.contains(125000L))
  }

  test("total concentration scores gini (n-1)/n; HHI ~ 1; top share 1") {
    val (n, total, gini, hhi, top) =
      conc(Seq("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 1000L))
    assert(n == 4 && total == 1000)
    assert(gini.contains(750000L)) // (n-1)/n = 3/4
    assert(hhi.contains(1000000L))
    assert(top.contains(1000000L))
  }

  test("hand case with ties matches the textbook formula") {
    // masses 1,1,2,4 ascending: sum i*x = 1+2+6+16 = 25, n=4, S=8
    // gini = (2*25 - 5*8) / (4*8) = 10/32 = 0.3125
    val (_, _, gini, _, _) = conc(
      Seq("a" -> 1L, "b" -> 1L, "c" -> 2L, "d" -> 4L))
    assert(gini.contains(312500L))
    // tie-invariance: same multiset from pre-aggregated duplicate keys
    val (_, _, g2, _, _) = Inequality.concentration(
      Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "c" -> 1L, "d" -> 4L)
        .toDF("k", "x"), "k", "x")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(g2.contains(312500L))
  }

  test("zero total mass yields NULL metrics; negatives are rejected") {
    val (n, total, gini, hhi, top) =
      conc(Seq("a" -> 0L, "b" -> 0L))
    assert(n == 2 && total == 0)
    assert(gini.isEmpty && hhi.isEmpty && top.isEmpty)
    intercept[IllegalArgumentException] {
      conc(Seq("a" -> -1L, "b" -> 5L))
    }
  }
}
