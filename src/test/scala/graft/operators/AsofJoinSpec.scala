package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsof: latest right row at-or-before each left row, per key") {
    val quotes = Seq( // key, ts, price
      ("A", 8L, 1.0), ("A", 15L, 2.0), ("B", 3L, 9.0))
      .toDF("sym", "qts", "price")
    val trades = Seq( // key, ts, qty
      ("A", 10L, 100), ("A", 15L, 200), ("A", 20L, 300),
      ("B", 1L, 400), ("C", 5L, 500))
      .toDF("sym", "tts", "qty")
    val out = AsofJoin.leftAsof(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("price"))
      .orderBy("sym", "tts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("A", 10L, 100, Some(1.0)),  // quote@8
      ("A", 15L, 200, Some(2.0)),  // quote@15 (<= inclusive)
      ("A", 20L, 300, Some(2.0)),  // carried forward
      ("B", 1L, 400, None),        // no quote yet
      ("C", 5L, 500, None)))       // key absent on right
  }

  test("leftAsof: equal-ts right rows resolve deterministically (max value)") {
    // two quotes share (sym, ts=10): the carried value must be the same
    // on any partition layout — the greatest value tuple wins
    val quotes = Seq(("A", 10L, 1.0), ("A", 10L, 5.0), ("A", 10L, 3.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(("A", 12L, 100)).toDF("sym", "tts", "qty")
    (1 to 5).foreach { i =>
      val out = AsofJoin.leftAsof(
        trades, quotes.repartition(i), Seq("sym"), "tts", "qts", Seq("price"))
      assert(out.select("asof_price").as[Double].head() == 5.0, s"repartition($i)")
    }
  }

  test("leftAsof ≡ brute force on randomized data (incl. duplicate ts)") {
    import org.scalacheck.{Gen, Prop}
    val row = for {
      k <- Gen.choose(0L, 4L)    // few keys → collisions guaranteed
      ts <- Gen.choose(0L, 20L)  // small range → duplicate ts guaranteed
      v <- Gen.choose(0, 99).map(_.toDouble)
    } yield (k, ts, v)
    val prop = Prop.forAll(Gen.listOfN(30, row), Gen.listOfN(30, row)) { (l, r) =>
      val left = l.toDF("k", "ts", "v")
      val right = r.toDF("k", "ts", "w")
      val got = AsofJoin.leftAsof(left, right, Seq("k"), "ts", "ts", Seq("w"))
        .select("k", "ts", "v", "asof_w").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))
        .sortBy(t => (t._1, t._2, t._3))
      val expect = l.map { case (k, ts, v) =>
        val cands = r.filter(q => q._1 == k && q._2 <= ts)
        // latest ts wins; equal-ts ties resolve to the max value tuple
        val w = if (cands.isEmpty) None
          else Some(cands.maxBy(q => (q._2, q._3))._3)
        (k, ts, v, w)
      }.sortBy(t => (t._1, t._2, t._3))
      Prop(got.toSeq == expect) :| s"got=${got.take(5).toSeq} expect=${expect.take(5)}"
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("leftAsof preserves left row count exactly") {
    val left = (1 to 100).map(i => (i % 7L, i.toLong, i)).toDF("k", "ts", "v")
    val right = (1 to 30).map(i => (i % 5L, i * 3L, i * 1.5)).toDF("k", "ts", "w")
    val out = AsofJoin.leftAsof(left, right, Seq("k"), "ts", "ts", Seq("w"))
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("k", "ts", "v", "asof_w"))
  }
}
