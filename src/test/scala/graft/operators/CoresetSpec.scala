package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("hand case: farthest-point traversal picks the spread, radius recorded") {
    // line: 0, 1, 2, 10 (ids 1..4). Seed = id 1 ([0]); farthest = id 4
    // ([10], d=100·10⁶²… on the integer grid); then id 3 ([2], d=4·grid²).
    val got = Coreset.kCenterGreedy(
      df((1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(2f)), (4L, Seq(10f))),
      "vec_id", "embedding", k = 3)
      .orderBy("round").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 4L, 3L))
    assert(got(0).isNullAt(2))
    // grid: floor(x·1000)+10000 → units of 1000 per 1.0
    assert(got(1).getLong(2) == 10000L * 10000L)
    assert(got(2).getLong(2) == 2000L * 2000L)
  }

  test("tie-break: equal farthest distances pick the lower id") {
    // seed id 1 at 0; ids 2 and 3 both at distance 5
    val got = Coreset.kCenterGreedy(
      df((1L, Seq(0f)), (3L, Seq(5f)), (2L, Seq(-5f))),
      "vec_id", "embedding", k = 2).orderBy("round").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("radius sequence is non-increasing; coverage radius certified") {
    val rng = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i =>
      (i, Seq.fill(8)(rng.nextFloat() * 2f - 1f)))
    val picks = Coreset.kCenterGreedy(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 6).orderBy("round").collect()
    val radii = picks.drop(1).map(_.getLong(2))
    radii.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
    // every point's min-dist to the picks is <= the NEXT pick's radius
    // bound: re-derive assignments and check max dist <= last radius
    // would need pick k+1; instead check the k-th pick maximized: no
    // remaining point is farther than the final radius + its own cover
    val centerVecs = picks.map { r =>
      val v = vecs.find(_._1 == r.getLong(1)).get._2
      (r.getLong(1), v.map(x => math.floor(x.toDouble * 1000.0).toLong + 10000L).toArray)
    }
    val assigned = Coreset.assign(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", centerVecs.toSeq)
    val maxMin = assigned.agg(max("dist_sq")).collect().head.getLong(0)
    // max-min dist after all k picks can't exceed the last pick's radius
    assert(maxMin <= radii.last)
  }

  test("deterministic across partitionings") {
    val rng = new scala.util.Random(11)
    val vecs = (1L to 300L).map(i => (i, Seq.fill(4)(rng.nextFloat())))
    def run(parts: Int) = Coreset.kCenterGreedy(
      vecs.toDF("vec_id", "embedding").repartition(parts),
      "vec_id", "embedding", k = 5)
      .orderBy("round").collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(run(1) == run(7))
  }

  test("assign: nearest pick wins, ties to the center listed as smaller id") {
    val centers = Seq(
      (10L, Array(10000L)), // 0.0 on the grid
      (20L, Array(14000L))) // 4.0
    val out = Coreset.assign(df((1L, Seq(1f)), (2L, Seq(3f)), (3L, Seq(2f))),
      "vec_id", "embedding", centers)
      .orderBy("vec_id").collect()
    assert(out(0).getLong(1) == 10L) // 1.0 -> 0.0
    assert(out(1).getLong(1) == 20L) // 3.0 -> 4.0
    // 2.0 equidistant (2000² both) -> struct-least ties on cid -> 10
    assert(out(2).getLong(1) == 10L && out(2).getLong(2) == 2000L * 2000L)
    // pure projection
    val plan = Coreset.assign(df((1L, Seq(1f))), "vec_id", "embedding",
      centers).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
