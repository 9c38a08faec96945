package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactPercentiles: type-1 quantile at max(1, ceil(n*p/100))") {
    // group a: 1..10 → p25→rank3, p50→rank5, p75→rank8, p99→rank10
    // group b: single row → every pct picks it
    val df = ((1 to 10).map(i => ("a", i.toDouble)) :+ ("b", 42.0))
      .toDF("k", "v")
    val out = Quantiles.exactPercentiles(df, Seq("k"), "v", Seq(25, 50, 75, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 25)) == 3.0)
    assert(out(("a", 50)) == 5.0)
    assert(out(("a", 75)) == 8.0)
    assert(out(("a", 99)) == 10.0)
    assert(Seq(25, 50, 75, 99).forall(p => out(("b", p)) == 42.0))
  }

  test("exactPercentiles: integer rank math avoids double-ceil drift") {
    // n=20, p=95: mathematical ceil(19.0)=19; double 0.95*20=19.000000000000004
    // would ceil to 20 — integer (20*95+99) div 100 = 19 is exact
    val df = (1 to 20).map(i => ("g", i)).toDF("k", "v")
    val out = Quantiles.exactPercentiles(df, Seq("k"), "v", Seq(95))
      .collect()
    assert(out.length == 1 && out.head.getInt(2) == 19)
  }

  test("exactPercentiles: p100 is the max; duplicate values untouched") {
    val df = Seq(("g", 5), ("g", 5), ("g", 1)).toDF("k", "v")
    val out = Quantiles.exactPercentiles(df, Seq("k"), "v", Seq(50, 100))
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(out(50) == 5 && out(100) == 5)
  }

  test("exactPercentiles: n column reports group size") {
    val df = (1 to 7).map(i => ("g", i)).toDF("k", "v")
    val out = Quantiles.exactPercentiles(df, Seq("k"), "v", Seq(50)).collect()
    assert(out.head.getLong(3) == 7L)
  }

  test("exactGlobalPercentiles: histogram refinement equals the sorted answer") {
    val rnd = new scala.util.Random(7)
    val values = Array.fill(5000)(rnd.nextGaussian() * 100.0)
    val df = values.toSeq.toDF("v")
    // directThreshold=50 forces several refinement rounds on 5000 rows
    val out = Quantiles.exactGlobalPercentiles(df, "v", Seq(25, 50, 75, 95, 99),
      buckets = 16, directThreshold = 50L)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sorted = values.sorted
    Seq(25, 50, 75, 95, 99).foreach { p =>
      val rank = math.max(1L, (values.length.toLong * p + 99) / 100).toInt
      assert(out(p) == sorted(rank - 1),
        s"p$p: got ${out(p)}, want ${sorted(rank - 1)}")
    }
  }

  test("binByCuts: strict-above semantics, cut values land in the lower bin") {
    val df = Seq(1.0, 2.0, 2.0, 3.0, 5.0).toDF("x")
    val got = Quantiles.binByCuts(df, "x", Seq(2.0, 4.0))
      .groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1.0, 2.0, 2.0 -> bin 0 (== cut is NOT above); 3.0 -> 1; 5.0 -> 2
    assert(got == Map(0L -> 3L, 1L -> 1L, 2L -> 1L), got.toString)
  }

  test("exactGlobalPercentiles: constant column and heavy duplicates") {
    val df = (Seq.fill(200)(5.0) ++ Seq.fill(100)(1.0) ++ Seq.fill(100)(9.0))
      .toDF("v")
    val out = Quantiles.exactGlobalPercentiles(df, "v", Seq(50, 99),
      buckets = 4, directThreshold = 10L)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // sorted: 100×1.0, 200×5.0, 100×9.0 → rank200=5.0, rank396=9.0
    assert(out(50) == 5.0 && out(99) == 9.0)
    val const = Seq.fill(300)(3.25).toDF("v")
    val c = Quantiles.exactGlobalPercentiles(const, "v", Seq(50),
      buckets = 4, directThreshold = 10L).collect()
    assert(c.head.getDouble(1) == 3.25)
  }

  test("exactPercentiles: NULL values excluded from ranking and n") {
    val df = Seq[(String, Option[Int])](
      ("g", Some(10)), ("g", None), ("g", Some(20)),
      ("g", Some(30)), ("g", None)).toDF("k", "v")
    val out = Quantiles.exactPercentiles(df, Seq("k"), "v", Seq(50, 100))
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getLong(3))).toMap
    // non-null sorted: 10, 20, 30 -> n = 3; p50 rank 2 -> 20, p100 -> 30
    assert(out == Map(50 -> (20, 3L), 100 -> (30, 3L)), out.toString)
  }

  test("madOutliers: hand case — median, MAD, and the 3.5 modified z cut") {
    // group g: 9 points around 100 plus one wild point. sorted values
    // 96..104 ∪ 1000: low median (n=10 → rank 5) = 100; deviations
    // sorted 0,1,1,2,2,3,3,4,4,900 → MAD (rank 5) = 2.
    // flag iff 6745·dev > 35000·2 = 70000 → dev ≥ 11: only the wild point.
    val vals = Seq(96L, 97L, 99L, 100L, 100L, 102L, 102L, 103L, 104L, 1000L)
    val df = vals.map(("g", _)).toDF("k", "v")
    val out = Quantiles.madOutliers(df, Seq("k"), "v").collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4),
      out.getLong(5)) == ((10L, 100L, 2L, 1L, 900L)))
  }

  test("madOutliers: robust where the sigma rule is dragged by its own outlier") {
    // one colossal outlier inflates stddev enough to hide itself from
    // a 3-sigma rule on small n; the MAD cut still flags it
    val vals = Seq.fill(8)(100L) :+ 100000L
    val df = vals.map(("g", _)).toDF("k", "v")
    val out = Quantiles.madOutliers(df, Seq("k"), "v").collect().head
    assert(out.getLong(4) == 1L, "MAD flags the planted outlier")
    val (mean, sd) = {
      val m = vals.sum.toDouble / vals.size
      (m, math.sqrt(vals.map(v => (v - m) * (v - m)).sum / vals.size))
    }
    assert(vals.count(v => math.abs(v - mean) > 3 * sd) == 0,
      "population 3-sigma rule misses it on this data — that's the point")
  }

  test("madOutliers: MAD = 0 degenerate flags every deviating point") {
    val df = (Seq.fill(6)(5L) ++ Seq(7L, 9L)).map(("g", _)).toDF("k", "v")
    val out = Quantiles.madOutliers(df, Seq("k"), "v").collect().head
    assert(out.getLong(3) == 0L && out.getLong(4) == 2L)
  }

  test("winsorizedMean: clamps exactly at the rank cuts; raw mean unchanged") {
    // 1..100 in one group: p5 cut = rank 5 → 5, p95 cut = rank 95 → 95.
    // winsorized sum = 4·5 + Σ5..95 + 5·95 = 20 + 4550 + 475 = 5045
    val df = (1L to 100L).map(("g", _)).toDF("k", "v")
    val out = Quantiles.winsorizedMean(df, Seq("k"), "v", 5, 95).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((100L, 5L, 95L)))
    assert(out.getLong(4) == 1000000L * 5050 / 100) // raw mean 50.5
    assert(out.getLong(5) == 1000000L * 5045 / 100)
  }

  test("winsorizedMean: a wild outlier moves the raw mean, barely the winsorized one") {
    val df = ((1L to 99L) :+ 1000000L).map(("g", _)).toDF("k", "v")
    val out = Quantiles.winsorizedMean(df, Seq("k"), "v", 5, 95).collect().head
    val raw = out.getLong(4); val win = out.getLong(5)
    assert(raw > 10000 * 1000000L, "raw mean dragged past 10k by the outlier")
    assert(win < 100 * 1000000L, "winsorized mean stays in the body's range")
  }

  test("madOutliers: per-group isolation and partition independence") {
    val df = (Seq.fill(5)(("a", 10L)) ++ Seq(("a", 500L)) ++
      Seq.fill(5)(("b", 10L))).toDF("k", "v")
    val a = Quantiles.madOutliers(df, Seq("k"), "v").collect().toSeq
    val b = Quantiles.madOutliers(df.repartition(7), Seq("k"), "v").collect().toSeq
    assert(a == b)
    val byKey = a.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byKey("a") == 1L && byKey("b") == 0L)
  }

  /** Reference weighted percentile: first distinct value whose
    * cumulative weight reaches p% of the total. */
  private def refWeighted(rows: Seq[(Long, Long)], p: Int): Long = {
    val byVal = rows.groupBy(_._1).map { case (v, rs) => v -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val tw = byVal.map(_._2).sum
    var cw = 0L
    byVal.find { case (_, w) => cw += w; cw * 100 >= tw * p }.get._1
  }

  test("weightedPercentiles ≡ reference cumulative-weight selection") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 800).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(200).toLong, 1L + rnd.nextInt(9)))
    val df = rows.toDF("k", "v", "w")
    val pcts = Seq(10, 50, 90, 100)
    val got = Quantiles.weightedPercentiles(df, Seq("k"), "v", "w", pcts)
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (g <- Seq("g0", "g1", "g2"); p <- pcts) {
      val sub = rows.filter(_._1 == g).map(r => (r._2, r._3))
      assert(got((g, p)) == ((refWeighted(sub, p), sub.map(_._2).sum)),
        s"group=$g pct=$p")
    }
  }

  test("weightedPercentiles with unit weights ≡ exactPercentiles") {
    val rnd = new scala.util.Random(59)
    val rows = (1 to 500).map(_ => ("k", rnd.nextInt(1000).toLong, 1L))
    val df = rows.toDF("k", "v", "w")
    val pcts = Seq(25, 50, 75, 95)
    val weighted = Quantiles.weightedPercentiles(df, Seq("k"), "v", "w", pcts)
      .as[(String, Int, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    val unweighted = Quantiles.exactPercentiles(df, Seq("k"), "v", pcts)
      .as[(String, Int, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(weighted == unweighted)
  }

  test("weightedPercentiles: nonpositive weights and null values are excluded") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, 0L), ("k", 3L, -4L), ("k", 100L, 5L))
      .toDF("k", "v", "w")
    val got = Quantiles.weightedPercentiles(df, Seq("k"), "v", "w", Seq(50, 100))
      .as[(String, Int, Long, Long)].collect().map(r => r._2 -> (r._3, r._4)).toMap
    assert(got == Map(50 -> ((1L, 10L)), 100 -> ((100L, 10L))))
  }

  test("ntileExact ≡ ntile window: ties, remainders, N<k, N%k==0") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(74)
    for ((n, k) <- Seq((500, 10), (500, 7), (100, 100), (5, 10), (1, 3))) {
      // heavy ties: values drawn from a small domain
      val df = (1 to n).map(i => (i.toLong, rnd.nextInt(17).toLong))
        .toDF("id", "v")
      val want = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "tile").as[(Long, Long)].collect().toMap
      val got = Quantiles.ntileExact(df, "v", "id", k)
        .select("id", "tile").as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("ntileExact: the only unpartitioned window runs over the histogram") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val df = (1 to 100).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "v")
    // sparkPlan, not executedPlan: AQE's AdaptiveSparkPlanExec hides
    // its children from collect until execution
    val exec = Quantiles.ntileExact(df, "v", "id", 10)
      .queryExecution.sparkPlan
    val (global, partitioned) = exec.collect { case w: WindowExec => w }
      .partition(_.partitionSpec.isEmpty)
    // one global window, and it consumes the groupBy(v) histogram —
    // distinct-value-sized, not row-sized; the row-sized window is
    // partitioned by value
    assert(global.size == 1 && partitioned.size == 1)
    assert(global.head.find(_.isInstanceOf[HashAggregateExec]).isDefined)
  }
}
