package graft.operators

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Boolean)], alpha: Int = 10) =
    Conformal.splitConformal(
      rows.toDF("g", "y", "yhat", "cal"), Seq("g"), "y", "yhat", "cal", alpha)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap

  test("qhat is the ceil((n+1)(1-alpha))-th score; coverage counts <= qhat") {
    // cal nonconformities 0..9 (n=10, alpha 10%): rank ceil(11·0.9)=10
    // → qhat = 9; test scores 5, 9, 10 → two covered
    val cal = (0L to 9L).map(v => ("g", v, 0L, true))
    val test = Seq(("g", 5L, 0L, false), ("g", 9L, 0L, false),
      ("g", 10L, 0L, false))
    assert(run(cal ++ test) ==
      Map("g" -> ((10L, 3L, Some(9L), 2L, Some(666666L)))))
  }

  test("tiny calibration slice yields qhat = NULL = +inf, full coverage") {
    // n_cal = 3: rank (4·90+99)//100 = 4 > 3 → conservative infinity
    val rows = Seq(("g", 0L, 0L, true), ("g", 1L, 0L, true),
      ("g", 2L, 0L, true), ("g", 999L, 0L, false))
    assert(run(rows) == Map("g" -> ((3L, 1L, None, 1L, Some(1000000L)))))
  }

  test("groups are independent; empty test slice has NULL coverage") {
    val rows =
      (0L to 9L).map(v => ("a", v, 0L, true)) ++ Seq(("a", 3L, 0L, false)) ++
        (0L to 9L).map(v => ("b", v * 100L, 0L, true))
    val out = run(rows)
    assert(out("a") == ((10L, 1L, Some(9L), 1L, Some(1000000L))))
    assert(out("b") == ((10L, 0L, Some(900L), 0L, None)))
  }

  test("alpha tightens qhat monotonically") {
    val cal = (1L to 100L).map(v => ("g", v, 0L, true))
    val q10 = run(cal, alpha = 10)("g")._3.get
    val q25 = run(cal, alpha = 25)("g")._3.get
    assert(q25 < q10)
    // exact ranks: ceil(101·0.90) = 91; ceil(101·0.75) = 76
    assert(q10 == 91L && q25 == 76L)
  }

  test("partitioning invariance") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 300).map(i => (s"g${i % 3}", rnd.nextInt(1000).toLong,
      500L, rnd.nextBoolean()))
    val one = run(rows)
    val many = Conformal.splitConformal(
      rows.toDF("g", "y", "yhat", "cal").repartition(13),
      Seq("g"), "y", "yhat", "cal", 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(one == many)
  }
}
