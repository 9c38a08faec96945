package graft.operators

import graft.SparkSpec

class KMeansIntSpec extends SparkSpec {
  import spark.implicits._

  test("lloyd: assignment follows integer argmin with lower-cell ties") {
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(9.0, 0.0)), (4L, Seq(4.0, 0.0)), (5L, Seq(6.0, 0.0)))
      .toDF("id", "vec")
    val out = KMeansInt.lloyd(vecs, "id", "vec", k = 2, iters = 1, dim = 2,
      scale = 1.0, offset = 0L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // seeds (0,0) and (10,0): 0,2,4 → cell 0; 1,3,5 → cell 1
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1))
  }

  test("lloyd: duplicate seeds → emptied cluster carries; updates reassign") {
    // seeds are ids 0,1 — identical, so every point ties to cell 0 in
    // round 1 and cell 1 empties. Update: c0 = floor-mean of all three
    // points = (1,1); c1 carries (0,0). Round 2: (0,0)-points flip to
    // the carried c1 (dist 0 beats 2), the far point stays on c0.
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(3.0, 3.0)))
      .toDF("id", "vec")
    val out = KMeansInt.lloyd(vecs, "id", "vec", k = 2, iters = 2, dim = 2,
      scale = 1.0, offset = 0L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 1, 1L -> 1, 2L -> 0))
  }

  test("lloyd: quantization floors at scale, offset keeps values positive") {
    // scale=10, offset=100: 0.96 → floor(9.6)+100 = 109; -0.17 → -2+100 = 98
    val vecs = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(-0.17f)), (3L, Seq(0.96f)))
      .toDF("id", "vec")
    val out = KMeansInt.lloyd(vecs, "id", "vec", k = 2, iters = 1, dim = 1,
      scale = 10.0, offset = 100L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(2L) == 0 && out(3L) == 1, s"got $out")
  }

  test("lloyd: carryCols ride through; cells are stable across reruns") {
    val vecs = Seq(
      (0L, "a", Seq(0.0, 0.0)), (1L, "b", Seq(10.0, 10.0)),
      (2L, "a", Seq(0.5, 0.5)), (3L, "b", Seq(9.0, 9.5)))
      .toDF("id", "tag", "vec")
    def run() = KMeansInt.lloyd(vecs, "id", "vec", k = 2, iters = 3, dim = 2,
      carryCols = Seq("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    val a = run(); val b = run()
    assert(a == b, "deterministic across reruns")
    assert(a.map(_._2) == Seq("a", "b", "a", "b"))
    assert(a(0)._3 == a(2)._3 && a(1)._3 == a(3)._3 && a(0)._3 != a(1)._3)
  }
}
