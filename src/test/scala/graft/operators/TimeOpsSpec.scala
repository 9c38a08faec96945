package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dateSpine is dense and inclusive of both bounds") {
    val df = Seq(ts("2024-03-01 10:00:00"), ts("2024-03-05 01:00:00"))
      .toDF("t")
    val days = TimeOps.dateSpine(df, "t").orderBy("day")
      .as[java.sql.Date].collect().map(_.toString)
    assert(days.toSeq == Seq("2024-03-01", "2024-03-02", "2024-03-03",
      "2024-03-04", "2024-03-05"))
  }

  test("gapFilledDaily surfaces zero-activity days with defaults") {
    val df = Seq(
      (ts("2024-03-01 10:00:00"), 5L),
      (ts("2024-03-01 11:00:00"), 7L),
      (ts("2024-03-03 09:00:00"), 1L)
    ).toDF("t", "v")
    val out = TimeOps.gapFilledDaily(df, "t",
      aggs = Seq("total" -> sum($"v"), "n" -> count(lit(1))),
      defaults = Map("total" -> lit(0L), "n" -> lit(0L)))
      .orderBy("day")
      .select($"day".cast("string"), $"total", $"n")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("2024-03-01", 12L, 2L),
      ("2024-03-02", 0L, 0L),   // the gap day exists and is zero, not absent
      ("2024-03-03", 1L, 1L)))
  }

  test("collapseBursts keeps the burst head with size and exact span") {
    val df = Seq(
      // key 1: burst of 3 (gaps 10s, 20s), then a lone event 100s later
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:00:10"), 2L),
      (1L, ts("2024-01-01 00:00:30"), 3L),
      (1L, ts("2024-01-01 00:05:00"), 4L),
      // key 2: chain semantics — consecutive gaps of 25s each stay one
      // burst even though first->last exceeds the 30s threshold
      (2L, ts("2024-01-01 00:00:00"), 5L),
      (2L, ts("2024-01-01 00:00:25"), 6L),
      (2L, ts("2024-01-01 00:00:50"), 7L)
    ).toDF("k", "t", "eid")
    val out = TimeOps.collapseBursts(df, Seq("k"), "t", "eid", gapSeconds = 30)
      .orderBy("k", "t")
      .select($"k", $"eid", $"burst_size", $"burst_span_us")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 30000000L),
      (1L, 4L, 1L, 0L),
      (2L, 5L, 3L, 50000000L)))
  }

  test("sigmaOutliers: exact k-sigma flags, no float variance") {
    // 20 values near 100 plus one extreme: only the extreme flags at 3σ
    val vals = (Seq.fill(10)(95L) ++ Seq.fill(10)(105L) :+ 1000L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val out = TimeOps.sigmaOutliers(vals.toDF("id", "v"), "v", k = 3)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(20L))
    assert((0L until 20L).forall(!out(_)))
    // replay the integer inequality by hand for every row
    val n = vals.size.toLong
    val s = vals.map(_._2).sum
    val q = vals.map(v => v._2 * v._2).sum
    for ((id, v) <- vals) {
      val dev = BigInt(v) * n - s
      val expect = dev * dev > BigInt(9) * (BigInt(n) * q - BigInt(s) * s)
      assert(out(id) == expect, s"row $id")
    }
  }

  test("sigmaOutliers: zero-variance series flags nothing") {
    val df = (1 to 8).map(i => (i.toLong, 42L)).toDF("id", "v")
    assert(TimeOps.sigmaOutliers(df, "v", 3).filter($"is_outlier").count() == 0)
  }

  test("sigmaOutliers: a value past the 10^15 magnitude contract fails loudly") {
    // pre-fix (with ANSI off) this value silently overflowed the
    // decimal(15,0) cast to NULL, dropped out of S and Q, and skewed
    // every flag. Loud failure now comes from one of two places: the
    // ANSI cast itself (default sessions), or the explicit range check
    // on the 38-digit cast (ANSI-off sessions)
    val df = Seq((1L, 5L), (2L, 1000000000000000L)).toDF("id", "v")
    val e = intercept[Exception] { TimeOps.sigmaOutliers(df, "v", 3) }
    assert(e.getMessage.contains("10^15") ||
      e.getClass.getSimpleName.contains("Arithmetic"), e.getMessage)
    // ANSI off: the range check is what fires
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e2 = intercept[IllegalArgumentException] {
        TimeOps.sigmaOutliers(df, "v", 3)
      }
      assert(e2.getMessage.contains("10^15"), e2.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("sigmaOutliers: literal-threshold plan — no join, no stats shuffle") {
    val df = (1 to 8).map(i => (i.toLong, i.toLong * 3)).toDF("id", "v")
    val plan = TimeOps.sigmaOutliers(df, "v", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"stats joined at runtime:\n$plan")
  }

  test("collapseBursts ties at equal ts resolve by the tie-break column") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 9L),
      (1L, ts("2024-01-01 00:00:00"), 3L)
    ).toDF("k", "t", "eid")
    val head = TimeOps.collapseBursts(df, Seq("k"), "t", "eid", 60)
      .select("eid").as[Long].collect()
    assert(head.toSeq == Seq(3L)) // lower eid is the head
  }

  test("ewmaChart: hand replay incl. FLOOR on a negative delta") {
    // alpha = 1/4. s1=10; x2=1: floor(-9/4) = -3 (trunc would say -2)
    // -> s2 = 7; x3=11: floor(4/4)=1 -> s3 = 8
    val pts = Seq(("k", 1L, 10L), ("k", 2L, 1L), ("k", 3L, 11L))
    val got = TimeOps.ewmaChart(pts.toDF("k", "t", "x"), "k", "t", "x",
        alphaDen = 4, threshold = 5L)
      .select("t", "x", "ewma", "flag")
      .as[(Long, Long, Long, Int)].collect().toList
    assert(got == List((1L, 10L, 10L, 0), (2L, 1L, 7L, 1), (3L, 11L, 8L, 0)))
  }

  test("ewmaChart: keys fold independently; result partitioning-invariant") {
    val rnd = new scala.util.Random(31)
    val pts = for (k <- Seq("a", "b", "c"); t <- 1 to 200)
      yield (k, t.toLong, rnd.nextInt(2000).toLong - 1000L)
    val df = pts.toDF("k", "t", "x")
    val one = TimeOps.ewmaChart(df, "k", "t", "x", 8, 400L).collect().toList
    val two = TimeOps.ewmaChart(df.repartition(11), "k", "t", "x", 8, 400L)
      .collect().toList
    assert(one.map(_.toString) == two.map(_.toString))
    // brute-force one key
    def replay(xs: List[Long]): List[Long] = xs match {
      case h :: t => t.scanLeft(h)((s, x) => s + Math.floorDiv(x - s, 8L))
      case Nil => Nil
    }
    val exp = replay(pts.filter(_._1 == "b").sortBy(_._2).map(_._3).toList)
    val gotB = one.filter(_.getString(0) == "b").map(_.getLong(3))
    assert(gotB == exp)
  }

  test("trendFit: exact line recovers slope and intercept in ppm") {
    val pts = (0L to 10L).map(x => ("k", x + 5000L, 3L * (x + 5000L) + 7L))
    // intercept is at the REBASED origin x0 = 5000: y(5000) = 15007
    val r = TimeOps.trendFit(pts.toDF("k", "x", "y"), "k", "x", "y").collect()(0)
    assert(r.getLong(1) == 11L)
    assert(r.getLong(2) == 3000000L)
    assert(r.getLong(3) == 15007L * 1000000L)
  }

  test("trendFit: negative non-integer slope floors (never truncates)") {
    // slope = -1/14 -> floor(-71428.57...) = -71429
    val pts = Seq(("k", 0L, 0L), ("k", 1L, 1L), ("k", 3L, 0L))
    val r = TimeOps.trendFit(pts.toDF("k", "x", "y"), "k", "x", "y").collect()(0)
    assert(r.getLong(2) == -71429L, s"slope ${r.getLong(2)}")
  }

  test("trendFit: rational fit matches hand arithmetic; x-shift invariant") {
    // (0,0),(1,1),(2,1): slope 1/2, intercept 1/6
    val base = Seq(0L -> 0L, 1L -> 1L, 2L -> 1L)
    for (shift <- Seq(0L, 1000L, 730000L)) {
      val pts = base.map { case (x, y) => ("k", x + shift, y) }
      val r = TimeOps.trendFit(pts.toDF("k", "x", "y"), "k", "x", "y").collect()(0)
      assert(r.getLong(2) == 500000L, s"shift=$shift")
      assert(r.getLong(3) == 166666L, s"shift=$shift") // floor(1e6/6)
    }
  }

  test("trendFit: magnitude breach fails loudly, never as silent NULL fits") {
    // n=2, rebased x span 1e9, max|y| 2e13: the intercept-numerator
    // bound N^2*X^2*(2e6*Y + 1e18) reaches ~1.6e38 >= 1e38
    val pts = Seq(("a", 0L, 20000000000000L), ("a", 1000000000L, 0L))
    val ex = intercept[IllegalArgumentException] {
      TimeOps.trendFit(pts.toDF("k", "x", "y"), "k", "x", "y").collect()
    }
    assert(ex.getMessage.contains("intercept numerator"), ex.getMessage)
    // just inside the bound at the same shape still computes
    val ok = Seq(("a", 0L, 10000000000000L), ("a", 1000000000L, 0L))
    val r = TimeOps.trendFit(ok.toDF("k", "x", "y"), "k", "x", "y").collect()(0)
    assert(!r.isNullAt(2) && !r.isNullAt(3))
  }

  test("trendFit: degenerate single-x key yields NULL fit; keys independent") {
    val pts = Seq(("flat", 5L, 10L), ("flat", 5L, 20L),
      ("up", 0L, 0L), ("up", 1L, 2L))
    val rs = TimeOps.trendFit(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rs("flat").isEmpty)
    assert(rs("up").contains(2000000L))
  }

  test("resampleFfill: dense daily grid, carry-forward, same-day latest wins") {
    def ts(day: Long, h: Int) =
      new java.sql.Timestamp((day * 86400L + h * 3600L) * 1000L)
    val df = Seq(
      ("a", ts(2, 1), 1L, 10.0),
      ("a", ts(4, 1), 2L, 20.0),
      ("a", ts(4, 9), 3L, 30.0),  // later same-day obs must win
      ("b", ts(1, 5), 4L, 5.0))
      .toDF("k", "t", "eid", "v")
    val out = TimeOps.resampleFfill(df, Seq("k"), "t", "eid", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))),
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    // global day range 1..4, both keys gridded
    assert(out.size == 8)
    assert(out(("a", 1L)) == ((None, None)), "before first obs: nulls")
    assert(out(("a", 2L)) == ((Some(10.0), Some(2L))))
    assert(out(("a", 3L)) == ((Some(10.0), Some(2L))), "gap day carries")
    assert(out(("a", 4L)) == ((Some(30.0), Some(4L))), "same-day latest wins")
    assert(out(("b", 4L)) == ((Some(5.0), Some(1L))))
  }

  private def series(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (i + 1L, x) }.toDF("t", "x")

  test("acf: strict alternation scores ~-1 at lag 1, ~+1 at lag 2") {
    val out = TimeOps.acf(series(Seq.fill(20)(Seq(100L, 200L)).flatten),
      "t", "x", maxLag = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // truncated-sum ACF is biased slightly toward 0; the sign and
    // near-unit magnitude are the invariant
    assert(out(1L) < -900000L && out(1L) >= -1000000L, out.toString)
    assert(out(2L) > 900000L && out(2L) <= 1000000L)
  }

  test("acf: period-7 cycle peaks at lag 7") {
    val cycle = Seq(10L, 30L, 50L, 90L, 40L, 20L, 70L)
    val out = TimeOps.acf(series(Seq.fill(30)(cycle).flatten), "t", "x", maxLag = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(7L) > out(1L) && out(7L) > out(6L) && out(7L) > out(8L))
    assert(out(7L) > 900000L)
  }

  test("acf: white-ish hash noise stays near zero at every lag") {
    val xs = (1 to 400).map(i =>
      (scala.util.hashing.MurmurHash3.stringHash(s"n$i").toLong % 1000) + 1000)
    val out = TimeOps.acf(series(xs), "t", "x", maxLag = 5).collect()
    out.foreach(r => assert(math.abs(r.getLong(2)) < 150000L,
      s"lag ${r.getLong(0)} = ${r.getLong(2)} ppm: not noise-like"))
  }

  test("acf: hand-replayed rational on a 5-point series") {
    // x = 1,2,3,4,10 (n=5, S=20): y = 5x-20 = -15,-10,-5,0,30
    // den = 225+100+25+0+900 = 1250
    // lag1: (-15)(-10)+(-10)(-5)+(-5)(0)+0*30 = 150+50 = 200 → 160000 ppm
    // lag2: (-15)(-5)+(-10)(0)+(-5)(30) = 75-150 = -75 → -60000 ppm
    val out = TimeOps.acf(series(Seq(1L, 2L, 3L, 4L, 10L)), "t", "x", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 4L, 160000L), (2L, 3L, -60000L)))
  }

  test("holtChart: hand-replayed level+trend recurrence") {
    // alpha = beta = 1/2 over 10,20,30,40:
    // t2: l=15 b=2 fc=10 | t3: l=23 b=5 fc=17 | t4: l=34 b=8 fc=28
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L), ("g", 4L, 40L))
      .toDF("k", "o", "x")
    val out = TimeOps.holtChart(df, "k", "o", "x", alphaDen = 2, betaDen = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 10L, 10L, 0L, 0L), (2L, 10L, 15L, 2L, 10L),
      (3L, 17L, 23L, 5L, 13L), (4L, 28L, 34L, 8L, 12L)))
  }

  test("holtChart: trend state tracks a steady ramp where EWMA lags forever") {
    // linear ramp: Holt's one-step error shrinks toward 0; EWMA's
    // stays pinned near slope·alphaDen
    val ramp = (1L to 40L).map(i => ("g", i, 100L * i))
    val holt = TimeOps.holtChart(ramp.toDF("k", "o", "x"), "k", "o", "x", 4, 5)
      .collect().map(r => r.getLong(1) -> math.abs(r.getLong(6))).toMap
    val ewma = TimeOps.ewmaChart(ramp.toDF("k", "o", "x"), "k", "o", "x", 4, Long.MaxValue)
      .collect().map(r => r.getLong(1) ->
        math.abs(r.getLong(2) - r.getLong(3))).toMap
    assert(holt(40L) < 50L, s"holt terminal error ${holt(40L)} should be < half a step")
    assert(ewma(40L) > 250L, "ewma lags a ramp by ~slope*(alphaDen-1)")
    // negative values flow through the sign-safe shifted floors
    val neg = TimeOps.holtChart(Seq(("g", 1L, 10L), ("g", 2L, -10L))
      .toDF("k", "o", "x"), "k", "o", "x", 2, 2).collect()
    assert(neg.map(r => (r.getLong(4), r.getLong(5))).toSeq ==
      Seq((10L, 0L), (0L, -5L)))
  }

  test("changepoint: finds the level shift; segment means are exact ppm") {
    val xs = Seq.fill(10)(5L) ++ Seq.fill(10)(50L)
    val out = TimeOps.changepoint(series(xs), "t", "x").collect().head
    assert(out.getLong(0) == 10L, "break after the last low point")
    assert(out.getLong(1) == 20L)
    assert(out.getLong(3) == 5000000L && out.getLong(4) == 50000000L)
  }

  test("changepoint: gradual drift picks the variance-optimal split deterministically") {
    val xs = (1L to 30L).map(i => i * 10)
    val a = TimeOps.changepoint(series(xs), "t", "x").collect().head
    val b = TimeOps.changepoint(series(xs).repartition(7), "t", "x").collect().head
    assert(a.toSeq == b.toSeq, "partitioning must not matter")
    // for a linear ramp the optimal two-mean split is the midpoint
    assert(a.getLong(0) == 15L)
  }

  test("acf: n_pairs shrinks by one per lag; constant series refuses loudly") {
    val out = TimeOps.acf(series((1L to 20L).map(i => i * i)), "t", "x", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 19L, 2L -> 18L, 3L -> 17L))
    val e = intercept[IllegalArgumentException] {
      TimeOps.acf(series(Seq.fill(10)(7L)), "t", "x", maxLag = 2)
    }
    assert(e.getMessage.contains("zero variance"))
  }

  /** Reference linear interpolation with mathematical floor. */
  private def refInterp(obs: Seq[(Long, Long)]): Seq[(Long, Long, Int)] = {
    val sorted = obs.sortBy(_._1)
    sorted.zip(sorted.tail).flatMap { case ((pd, pv), (nd, nv)) =>
      (pd until nd).map { t =>
        if (t == pd) (t, pv, 1)
        else (t, pv + Math.floorDiv((nv - pv) * (t - pd), nd - pd), 0)
      }
    } :+ ((sorted.last._1, sorted.last._2, 1))
  }

  test("resampleLinear ≡ floor interpolation, rising and falling segments") {
    val obs = Seq((0L, 10L), (4L, 22L), (7L, 1L), (8L, 1L), (13L, -9L))
    val df = obs.map { case (t, v) => ("k", t, v) }.toDF("k", "t", "v")
    val got = TimeOps.resampleLinear(df, Seq("k"), "t", "v")
      .as[(String, Long, Long, Int)].collect().sortBy(_._2)
      .map(r => (r._2, r._3, r._4)).toSeq
    assert(got == refInterp(obs))
    // falling segment with negative values exercises the sign-safe
    // floor: (8,1) -> (13,-9) steps by -2 exactly
    assert(got.filter(t => t._1 >= 8).map(_._2) == Seq(1L, -1L, -3L, -5L, -7L, -9L))
  }

  test("resampleLinear: per-key ranges stay independent; obs pass through") {
    val rnd = new scala.util.Random(61)
    val keys = Seq("a", "b", "c")
    val obs = keys.flatMap { k =>
      val ts = rnd.shuffle((0L to 40L).toList).take(8)
      ts.map(t => (k, t, rnd.nextInt(2000).toLong - 1000))
    }
    val df = obs.toDF("k", "t", "v")
    val got = TimeOps.resampleLinear(df, Seq("k"), "t", "v")
      .as[(String, Long, Long, Int)].collect()
    for (k <- keys) {
      val kObs = obs.filter(_._1 == k).map(o => (o._2, o._3))
      val kGot = got.filter(_._1 == k).sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
      assert(kGot == refInterp(kObs), s"key=$k")
      val (lo, hi) = (kObs.map(_._1).min, kObs.map(_._1).max)
      assert(kGot.map(_._1) == (lo to hi), s"key=$k grid must be dense")
      for ((t, v) <- kObs)
        assert(kGot.find(_._1 == t).get._2 == v, s"key=$k obs at $t must pass through")
    }
  }

  private def decomp(pts: Seq[(Long, Long)], period: Int = 3) = {
    import spark.implicits._
    TimeOps.seasonalDecompose(pts.toDF("t", "v"), "t", "v", period)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
  }

  test("seasonalDecompose: pure seasonal signal is recovered exactly") {
    // v cycles 0, 30, 60 (period 3, mean 30): trend = 30 everywhere
    // interior, seasonal = phase − mean, residual = 0
    val pts = (0L until 9L).map(t => t -> (t % 3) * 30L)
    val out = decomp(pts)
    assert(out(0L)._2.isEmpty && out(8L)._2.isEmpty) // edges have no window
    for (t <- 1L to 7L) {
      val (v, tr, se, re) = out(t)
      assert(tr.contains(30L) && se.contains(v - 30L) && re.contains(0L), s"t=$t")
    }
  }

  test("seasonalDecompose: linear trend + seasonal decomposes additively") {
    // v = 10·t + [0, 21, 0] cycle: the centered 3-window mean of the
    // linear part is exact; seasonal mean of [−7, 14, −7] phases
    val pts = (0L until 12L).map(t => t -> (10L * t + (if (t % 3 == 1) 21L else 0L)))
    val out = decomp(pts)
    for (t <- 1L to 10L) {
      val (v, tr, se, re) = out(t)
      assert(tr.contains(10L * t + 7L), s"t=$t trend") // 21/3 cycle lift
      assert(se.contains(if (t % 3 == 1) 14L else -7L), s"t=$t seasonal")
      assert(re.contains(v - tr.get - se.get), s"t=$t residual closure")
    }
  }

  test("seasonalDecompose: gaps and duplicate t fail loudly; even period rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      decomp(Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L))) // hole at 2
    }
    intercept[IllegalArgumentException] {
      decomp(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 4L)))
    }
    intercept[IllegalArgumentException] {
      TimeOps.seasonalDecompose(
        (0L to 9L).map(t => (t, t)).toDF("t", "v"), "t", "v", 4)
    }
  }

  test("seasonalDecompose: negative values floor toward -inf consistently") {
    // all-negative constant series: trend = v exactly, seasonal 0
    val pts = (0L until 6L).map(t => t -> -7L)
    val out = decomp(pts)
    assert(out(2L) == ((-7L, Some(-7L), Some(0L), Some(0L))))
  }

  test("seasonalDecompose: partitioning invariance") {
    import spark.implicits._
    val pts = (0L until 60L).map(t => t -> (t * 13 % 97 - 40L))
    val one = decomp(pts, period = 7)
    val many = TimeOps.seasonalDecompose(
      pts.toDF("t", "v").repartition(11), "t", "v", 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(one == many)
  }

  test("cusum: reflection identity ≡ the sequential Page recursion") {
    import spark.implicits._
    // pseudo-random drifting series, then replay s_t = max(0, s+d)
    val xs = (1L to 200L).map(t => t -> ((t * 37 % 23) +
      (if (t > 120) 15L else 0L)))
    val (ref, slack, thr) = (11L, 1L, 40L)
    val got = TimeOps.cusum(xs.toDF("t", "x").repartition(7), "t", "x",
        ref, slack, thr)
      .orderBy("t")
      .as[(Long, Long, Long, Boolean)].collect().toList
    var s = 0L
    val want = xs.map { case (t, x) =>
      s = math.max(0L, s + (x - ref - slack))
      (t, x, s, s > thr)
    }.toList
    assert(got == want)
    // the injected level shift must actually alarm, and not before it
    assert(got.filter(_._4).map(_._1).min > 120L)
    assert(got.exists(_._4))
  }

  test("cusum: rejects duplicate t and overflow-risk magnitudes") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      TimeOps.cusum(Seq(1L -> 2L, 1L -> 3L).toDF("t", "x"), "t", "x",
        0L, 0L, 1L).collect()
    }
    intercept[IllegalArgumentException] {
      TimeOps.cusum(
        Seq(1L -> Long.MaxValue / 2, 2L -> Long.MaxValue / 2,
          3L -> Long.MaxValue / 2)
          .toDF("t", "x"), "t", "x", 0L, 0L, 1L).collect()
    }
  }
}
