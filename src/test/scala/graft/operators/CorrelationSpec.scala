package graft.operators

import graft.SparkSpec

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- screen

  test("screen: perfectly linear pair scores exactly 10^6; moments are hand-exact") {
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = Correlation.screen(df, Seq("x", "y")).collect().head
    // cov_n2 = 3·28 − 6·12 = 12; varx = 3·14 − 36 = 6; vary = 3·56 − 144 = 24
    assert(r.getLong(2) == 3L && r.getLong(3) == 12L &&
      r.getLong(4) == 6L && r.getLong(5) == 24L)
    assert(r.getLong(6) == 1000000L)
  }

  test("screen: anti-correlated pair is signed negative; constant column is NULL") {
    val df = Seq((1L, 6L, 5L), (2L, 4L, 5L), (3L, 2L, 5L)).toDF("x", "y", "z")
    val out = Correlation.screen(df, Seq("x", "y", "z"))
      .orderBy("col_a", "col_b").collect()
    val xy = out.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getLong(6) == -1000000L)
    val xz = out.find(r => r.getString(0) == "x" && r.getString(1) == "z").get
    assert(xz.isNullAt(6))
  }

  // ------------------------------------------------------- kendallTau

  private def tau(rows: Seq[(String, Long, Long)]) =
    Correlation.kendallTau(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))
      .toSeq

  test("kendallTau: monotone sequence is exactly +10^6; one swap drops to 1/9") {
    assert(tau(Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L))) ==
      Seq(("a", 3L, 3L, 0L, 0L, 0L, 0L, Some(1000000L))))
    // (1,2),(2,1),(3,3): C=2, D=1 → τ² = 1/9
    assert(tau(Seq(("a", 1L, 2L), ("a", 2L, 1L), ("a", 3L, 3L))) ==
      Seq(("a", 3L, 2L, 1L, 0L, 0L, 0L, Some(111111L))))
  }

  test("kendallTau: tie bookkeeping matches the hand count") {
    // rows (1,1),(1,2),(2,2),(2,2): C=2 D=0 Tx=2 Ty=3 Txy=1,
    // τ-b² = 4/((6−2)(6−3)) = 1/3
    assert(tau(Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 2L), ("a", 2L, 2L))) ==
      Seq(("a", 4L, 2L, 0L, 2L, 3L, 1L, Some(333333L))))
  }

  test("kendallTau: constant side → NULL; reversed order is signed −10^6") {
    assert(tau(Seq(("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 7L)))
      .head._8.isEmpty)
    assert(tau(Seq(("a", 1L, 3L), ("a", 2L, 2L), ("a", 3L, 1L))) ==
      Seq(("a", 3L, 0L, 3L, 0L, 0L, 0L, Some(-1000000L))))
  }

  test("kendallTau: differential vs brute-force row pairs, multi-group") {
    val rnd = new scala.util.Random(11)
    val rows = for (g <- Seq("g1", "g2", "g3"); _ <- 1 to 40) yield
      (g, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong)
    def brute(rs: Seq[(Long, Long)]) = {
      val ps = for (i <- rs.indices; j <- rs.indices if i < j)
        yield (rs(i), rs(j))
      val c = ps.count { case (a, b) =>
        (a._1 < b._1 && a._2 < b._2) || (a._1 > b._1 && a._2 > b._2) }
      val dd = ps.count { case (a, b) =>
        (a._1 < b._1 && a._2 > b._2) || (a._1 > b._1 && a._2 < b._2) }
      val tx = ps.count { case (a, b) => a._1 == b._1 }
      val ty = ps.count { case (a, b) => a._2 == b._2 }
      val txy = ps.count { case (a, b) => a == b }
      (c.toLong, dd.toLong, tx.toLong, ty.toLong, txy.toLong)
    }
    val out = tau(rows)
    for ((g, n, c, dd, tx, ty, txy, t2) <- out) {
      val rs = rows.filter(_._1 == g).map(r => (r._2, r._3))
      val (bc, bd, btx, bty, btxy) = brute(rs)
      assert((n, c, dd, tx, ty, txy) == (rs.size.toLong, bc, bd, btx, bty, btxy),
        s"counts mismatch in $g")
      val n0 = rs.size.toLong * (rs.size - 1) / 2
      val denom = (n0 - btx) * (n0 - bty)
      val expT2 = if (denom <= 0) None
        else Some((if (bc < bd) -1L else 1L) * ((bc - bd) * (bc - bd) * 1000000L / denom))
      assert(t2 == expT2, s"tau2 mismatch in $g")
    }
  }

  test("kendallTau: partitioning invariance") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 120).map(_ =>
      ("g", rnd.nextInt(6).toLong, rnd.nextInt(6).toLong))
    val one = tau(rows)
    val many = Correlation.kendallTau(
      rows.toDF("g", "x", "y").repartition(17), Seq("g"), "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSeq
    assert(one == many)
  }

  // --------------------------------------------------------- spearman

  private def rho(rows: Seq[(String, Long, Long)]) =
    Correlation.spearman(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSeq

  test("spearman: monotone nonlinear map is exactly +10^6 (rank invariance)") {
    // y = x² — Pearson would be < 1, Spearman sees identical rank order
    val out = rho(Seq(("a", 1L, 1L), ("a", 2L, 4L), ("a", 3L, 9L)))
    // milliranks 333/666/1000 both sides: cov = vx = vy = 667334
    assert(out == Seq(("a", 3L, 667334L, 667334L, 667334L, Some(1000000L))))
  }

  test("spearman: anti-monotone is -10^6 up to rank quantization; constant side NULL") {
    // reversed milliranks (1000,666,333) are not the exact mirror of
    // (333,666,1000) — the floor in (r2·500) div n costs 1 unit on the
    // middle rank — so cov is −667333 against vx = vy = 667334 and the
    // score lands 3 ppm shy of −10⁶: the documented 10⁻³ quantization
    val out = rho(Seq(("a", 1L, 9L), ("a", 2L, 4L), ("a", 3L, 1L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L)))
    assert(out.head == ("a", 3L, -667333L, 667334L, 667334L, Some(-999997L)))
    assert(out(1)._1 == "b" && out(1)._6.isEmpty)
  }

  test("spearman: tie midranks are hand-exact") {
    // x = (1,1,2): doubled midranks (3,3,6) → milliranks (500,500,1000)
    // y = (1,2,3): milliranks (333,666,1000)
    val out = rho(Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L)))
    val (_, n, cov, vx, vy, _) = out.head
    assert((n, cov, vx, vy) == (3L, 500500L, 500000L, 667334L))
  }

  test("spearman: partitioning invariance and group independence") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 150).map(i =>
      (s"g${i % 3}", rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
    val one = rho(rows)
    val many = Correlation.spearman(
      rows.toDF("g", "x", "y").repartition(13), Seq("g"), "x", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSeq
    assert(one == many)
    // each group must equal its standalone computation
    for (g <- Seq("g0", "g1", "g2"))
      assert(rho(rows.filter(_._1 == g)) == one.filter(_._1 == g))
  }
}
