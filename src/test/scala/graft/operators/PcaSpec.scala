package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("hand-replayed two-dim case: axis-aligned data, exact integers") {
    // quantized vectors (1000, 0) and (0, 10): Gram = diag(1e6, 100)
    val df = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 0.01f)).toDF("embedding")
    val r = Pca.powerIteration(df, "embedding", dim = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: s = (1000*(1000*1e6), 10*(10*1e6)) = (1e12, 1e8);
    //   ma = 1e12 -> v1 = (1e6, 100)
    // round 2 (in-plan): s = (1000*1000*1e6, 10*10*100) = (1e12, 1e4);
    //   ma = 1e12 -> v2 = (1e6, floor(1e4*1e6/1e12) = floor(0.01) = 0)
    assert(r == Map(0L -> 1000000L, 1L -> 0L), r.toString)
  }

  test("converges to the dominant direction with a negative component") {
    val rnd = new scala.util.Random(5)
    val diag = (1 to 200).map { _ =>
      val n = (rnd.nextDouble() * 0.01).toFloat
      Seq(1.0f + n, -1.0f + n)
    }
    val df = (diag :+ Seq(1.0f, 0.0f)).toDF("embedding")
    val r = Pca.powerIteration(df, "embedding", dim = 2, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(0L) == 1000000L, r.toString)
    assert(r(1L) < -900000L, r.toString)
  }

  test("result is invariant to input partitioning") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 300).map(_ => Seq.fill(8)((rnd.nextDouble() - 0.4).toFloat))
      .toDF("embedding")
    val a = Pca.powerIteration(df, "embedding", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val b = Pca.powerIteration(df.repartition(17), "embedding", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(a == b)
  }

  test("rows with the wrong dimensionality are dropped, not crashed on") {
    val df = Seq(Seq(1.0f, 0.0f), Seq(0.5f), Seq(0.0f, 0.01f, 3.0f))
      .toDF("embedding")
    val r = Pca.powerIteration(df, "embedding", dim = 2, iters = 1)
      .collect().map(_.getLong(1)).toList
    assert(r.nonEmpty) // only the 2-dim row participates; no exception
  }
}
