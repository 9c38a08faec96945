package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Histogram sketch: exact counting, clamping, merge, and quantile
  * interpolation against exact percentiles. */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bin counts are exact and out-of-range values clamp to edge bins") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0).toDF("x")
    val c = Histogram.counts(df, "x", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(0L) == 3L) // -5 (clamped), 0, 9.9
    assert(c(1L) == 1L) // 10.0
    assert(c(5L) == 1L) // 55
    assert(c(9L) == 3L) // 99.9, 100 (clamped), 250 (clamped)
  }

  test("counter tables merge by groupBy-sum") {
    val all = (1 to 1000).map(_.toDouble).toDF("x")
    val (a, b) = ((1 to 400).map(_.toDouble).toDF("x"),
      (401 to 1000).map(_.toDouble).toDF("x"))
    val merged = Histogram.counts(a, "x", 0.0, 1000.0, 16)
      .union(Histogram.counts(b, "x", 0.0, 1000.0, 16))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    val whole = Histogram.counts(all, "x", 0.0, 1000.0, 16)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("quantile estimates land within one bin width of exact percentiles") {
    val xs = (1 to 10000).map(_.toDouble)
    val counters = Histogram.counts(xs.toDF("x"), "x", 0.0, 10000.0, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Histogram.quantiles(counters, 0.0, 10000.0, 100, qs)
    val binWidth = 100.0
    qs.zip(est).foreach { case (q, e) =>
      val exact = q * 10000.0
      assert(math.abs(e - exact) <= binWidth, s"q=$q est=$e exact=$exact")
    }
  }

  test("quantiles are monotone in q and bounded by [lo, hi]") {
    val xs = (1 to 500).map(i => (i * i % 977).toDouble)
    val counters = Histogram.counts(xs.toDF("x"), "x", 0.0, 1000.0, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val est = Histogram.quantiles(counters, 0.0, 1000.0, 32,
      Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    assert(est == est.sorted)
    assert(est.head >= 0.0 && est.last <= 1000.0)
  }
}
