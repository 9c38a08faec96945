package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HilbertIndex

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def curve(bits: Int): Map[(Long, Long), Long] = {
    val n = 1L << bits
    (for (x <- 0L until n; y <- 0L until n)
      yield (x, y) -> HilbertIndex.compute(x, y, bits)).toMap
  }

  test("bijection onto [0, 4^bits) for bits = 1..8") {
    (1 to 8).foreach { bits =>
      val c = curve(bits)
      val n = 1L << bits
      assert(c.values.toSet == (0L until n * n).toSet, s"bits=$bits")
    }
  }

  test("unit-step adjacency: consecutive indexes are grid neighbors (the Hilbert property)") {
    (1 to 7).foreach { bits =>
      val byD = curve(bits).map(_.swap)
      val n = 1L << bits
      (1L until n * n).foreach { d =>
        val (x0, y0) = byD(d - 1); val (x1, y1) = byD(d)
        assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1L,
          s"bits=$bits d=$d: ($x0,$y0) -> ($x1,$y1)")
      }
    }
  }

  /** Number of contiguous index runs needed to read an axis box. */
  private def runs(keys: Seq[Long]): Int = {
    val s = keys.sorted
    1 + s.sliding(2).count { case Seq(a, b) => b != a + 1; case _ => false }
  }

  test("Moon et al. clustering: Hilbert covers rectangles in fewer runs than Morton (8x8 exhaustive)") {
    val bits = 3; val n = 1 << bits
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) + (((y >> b) & 1L) << (2 * b + 1))).sum
    var (hTotal, zTotal) = (0L, 0L)
    for (x0 <- 0 until n; x1 <- x0 until n; y0 <- 0 until n; y1 <- y0 until n) {
      val cells = for (x <- x0 to x1; y <- y0 to y1) yield (x.toLong, y.toLong)
      hTotal += runs(cells.map { case (x, y) => HilbertIndex.compute(x, y, bits) })
      zTotal += runs(cells.map { case (x, y) => morton(x, y) })
    }
    assert(hTotal < zTotal, s"hilbert=$hTotal morton=$zTotal")
  }

  test("compiled expression == interpreted compute, and masks out-of-grid input") {
    val bits = 5
    val rows = (for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)).toDF("x", "y")
    val got = rows.select($"x", $"y",
        HilbertIndex($"x", $"y", bits).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    got.foreach { case ((x, y), h) =>
      assert(h == HilbertIndex.compute(x, y, bits), s"($x,$y)")
    }
    // out-of-grid coordinates fold onto the masked cell
    assert(got((33L, 2L)) == HilbertIndex.compute(1L, 2L, bits))
  }

  test("null in, null out; plan is a pure projection") {
    val df = Seq((Some(1L), Option.empty[Long]), (Some(2L), Some(3L)))
      .toDF("x", "y")
      .select(HilbertIndex($"x", $"y", 4).as("h"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("hValue quantization matches ZOrder's contract (edge clamp)") {
    val df = Seq((-5.0, 0.0), (0.0, 0.0), (63.9, 109999.0), (999.0, 1e9))
      .toDF("a", "b")
    val got = df.select(Hilbert.hValue(($"a", 0.0, 64.0),
      ($"b", 0.0, 110000.0), 6).as("h")).collect().map(_.getLong(0))
    assert(got(0) == HilbertIndex.compute(0L, 0L, 6)) // clamped low
    assert(got(1) == HilbertIndex.compute(0L, 0L, 6))
    assert(got(2) == HilbertIndex.compute(63L, 63L, 6))
    assert(got(3) == HilbertIndex.compute(63L, 63L, 6)) // clamped high
  }

  test("cluster: range-partitioned output has disjoint per-partition key ranges") {
    val df = (0L until 4096L).map(i => (i * 2654435761L % 64L,
      (i * 40503L % 64L).toDouble)).toDF("a", "b")
    val clustered = Hilbert.cluster(df, (col("a"), 0.0, 64.0),
      (col("b"), 0.0, 64.0), 6, numPartitions = 8)
    val perPart = clustered
      .withColumn("h", Hilbert.hValue((col("a"), 0.0, 64.0), (col("b"), 0.0, 64.0), 6))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("h").as("lo"), max("h").as("hi"))
      .orderBy("lo").collect()
    perPart.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"), s"$a vs $b")
      case _ =>
    }
  }
}
