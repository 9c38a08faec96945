package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton curve: interleave correctness against a reference
  * implementation, locality, and the clustering contract. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches a reference bit-interleave on the full grid") {
    val pts = for (a <- 0 until 16; b <- 0 until 16) yield (a.toDouble, b.toDouble)
    val got = pts.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue(Seq(
        ($"a", 0.0, 16.0), ($"b", 0.0, 16.0)), 4).as("z"))
      .collect().map(r => (r.getDouble(0).toLong, r.getDouble(1).toLong) -> r.getLong(2))
      .toMap
    for (a <- 0L until 16L; b <- 0L until 16L)
      assert(got((a, b)) == mortonRef(a, b, 4), s"($a,$b)")
  }

  test("locality: points in the same quadrant share a z prefix") {
    // top-level quadrant = the top two interleaved bits: all points
    // with a,b < 8 (of 16) sort before any point with a,b >= 8
    val z = (a: Double, b: Double) =>
      Seq((a, b)).toDF("a", "b")
        .select(ZOrder.zValue(Seq(($"a", 0.0, 16.0), ($"b", 0.0, 16.0)), 4))
        .head().getLong(0)
    val lowMax = (for (a <- 0 until 8; b <- 0 until 8)
      yield z(a.toDouble, b.toDouble)).max
    assert(lowMax < z(8.0, 8.0))
  }

  test("cluster: partition z-ranges are disjoint and rows sorted within") {
    val df = (1 to 4000).map(i => ((i * 37 % 997).toDouble, (i * 53 % 983).toDouble))
      .toDF("a", "b")
    val dims = Seq(($"a", 0.0, 1000.0), ($"b", 0.0, 1000.0))
    val clustered = ZOrder.cluster(df, dims, 8, 8)
      .withColumn("z", ZOrder.zValue(dims, 8))
      .withColumn("pid", spark_partition_id())
    val ranges = clustered.groupBy("pid")
      .agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .orderBy("lo").collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(2) <= y.getLong(1),
        s"overlapping z ranges: $x vs $y")
      case _ =>
    }
    // rows preserved
    assert(ranges.map(_.getLong(3)).sum == 4000L)
  }
}
