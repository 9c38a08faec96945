package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // path graph a-b-c (symmetric): b is the hub and must outrank a and c,
  // which are symmetric and must tie exactly (integer arithmetic)
  private val path = Seq(
    ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")
  ).toDF("src", "dst")

  test("hub outranks leaves; symmetric leaves tie bit-exactly") {
    val r = GraphOps.pageRank(path, iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(r("b") > r("a"))
    assert(r("a") == r("c"))
    assert(r.size == 3)
  }

  test("replays the reference integer recurrence exactly") {
    // hand-rolled fixed-point recurrence, same integer ops
    val n = 3L
    val base = (GraphOps.Scale / n) * 15 / 100
    var ra, rb, rc = GraphOps.Scale / n
    for (_ <- 1 to 3) {
      val (na, nb, nc) = (
        base + 85 * (rb / 2) / 100,            // a <- half of b
        base + 85 * (ra / 1 + rc / 1) / 100,   // b <- all of a and c
        base + 85 * (rb / 2) / 100)            // c <- half of b
      ra = na; rb = nb; rc = nc
    }
    val r = GraphOps.pageRank(path, iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(r("a") == ra && r("b") == rb && r("c") == rc)
  }

  test("total mass stays within floor-division loss of SCALE") {
    val r = GraphOps.pageRank(path, iterations = 3)
      .as[(String, Long)].collect().map(_._2)
    val total = r.sum
    // each round loses < (deg sum + nodes*100) units to floors
    assert(total <= GraphOps.Scale && total > GraphOps.Scale - 10000)
  }

  test("result is invariant to input partitioning") {
    val r1 = GraphOps.pageRank(path.repartition(7), iterations = 2)
      .as[(String, Long)].collect().toMap
    val r2 = GraphOps.pageRank(path.coalesce(1), iterations = 2)
      .as[(String, Long)].collect().toMap
    assert(r1 == r2)
  }
}
