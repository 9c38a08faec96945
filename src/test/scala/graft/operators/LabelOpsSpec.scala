package graft.operators

import graft.SparkSpec

class LabelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("majority winner with exact agreement; ties to lexically smallest") {
    val rows = Seq(
      ("i1", "cat"), ("i1", "cat"), ("i1", "dog"),            // clear winner
      ("i2", "b"), ("i2", "a"),                               // tie -> "a"
      ("i3", "z")                                             // unanimous
    )
    val got = LabelOps.majorityVote(rows.toDF("item", "lab"), "item", "lab")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("i1") == (("cat", 2L, 3L, 2L, 666666L)))
    assert(got("i2") == (("a", 1L, 2L, 2L, 500000L)))
    assert(got("i3") == (("z", 1L, 1L, 1L, 1000000L)))
  }

  test("null items and null labels are abstentions, not votes") {
    val rows = Seq(
      (Some("i"), Some("x")), (Some("i"), None), (None, Some("y"))
    )
    val got = LabelOps.majorityVote(rows.toDF("item", "lab"), "item", "lab")
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "x" && got(0).getLong(3) == 1L)
  }

  test("reliability weighting flips a careless majority, exact ppm weights") {
    // gold items g1..g5: careful c1,c2 vote A; sloppy s1,s2,s3 scatter
    // B/C/D -> majority A. Target t: c's vote X, s's all vote Y.
    val gold = (1 to 5).flatMap(i => Seq(
      (s"g$i", "c1", "A"), (s"g$i", "c2", "A"),
      (s"g$i", "s1", "B"), (s"g$i", "s2", "C"), (s"g$i", "s3", "D")))
    val target = Seq(("t", "c1", "X"), ("t", "c2", "X"),
      ("t", "s1", "Y"), ("t", "s2", "Y"), ("t", "s3", "Y"))
    val df = (gold ++ target).toDF("item", "ann", "lab")
    // plain majority on t is Y (3 > 2)...
    val plain = LabelOps.majorityVote(target.toDF("item", "ann", "lab")
      .select($"item", $"lab"), "item", "lab").collect()(0)
    assert(plain.getString(1) == "Y")
    // ...but reliability re-weighting picks X: rel(c)=5e6/6 div=833333,
    // rel(s)=1e6/6 div=166666 -> X: 2*833333=1666666 > Y: 3*166666=499998
    val r = LabelOps.reliabilityWeightedVote(df, "item", "ann", "lab")
      .collect().map(x => x.getString(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("t") == (("X", 1666666L, 5L)), r("t").toString)
    assert((1 to 5).forall(i => r(s"g$i")._1 == "A"))
  }

  test("winner is partitioning-invariant (total order, no arbitrary first)") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 2000).map(_ =>
      (s"i${rnd.nextInt(40)}", s"l${rnd.nextInt(4)}"))
    val df = rows.toDF("item", "lab")
    val a = LabelOps.majorityVote(df, "item", "lab").collect().toList
    val b = LabelOps.majorityVote(df.repartition(17), "item", "lab").collect().toList
    assert(a.map(_.toString) == b.map(_.toString))
    // cross-check one key by brute force
    val k = "i7"
    val byLab = rows.filter(_._1 == k).groupBy(_._2).view.mapValues(_.size).toMap
    if (byLab.nonEmpty) {
      val best = byLab.toSeq.sortBy { case (l, v) => (-v, l) }.head
      val row = a.find(_.getString(0) == k).get
      assert((row.getString(1), row.getLong(2).toInt) == best)
    }
  }

  test("fleissKappa: perfect agreement scores exactly 10^6") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("subject", "label")
    val r = LabelOps.fleissKappa(df, "subject", "label").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getLong(4) == 1000000L)
  }

  test("fleissKappa: systematic disagreement scores exactly -10^6") {
    // every subject gets one 'a' and one 'b': observed agreement 0,
    // chance 1/2 -> kappa = -1
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("subject", "label")
    val r = LabelOps.fleissKappa(df, "subject", "label").collect().head
    assert(r.getLong(2) == 0) // pbar_ppm
    assert(r.getLong(4) == -1000000L)
  }

  test("fleissKappa: matches the textbook double computation on random data") {
    val rnd = new scala.util.Random(89)
    val n = 4
    val rows = for (s <- 1 to 60; _ <- 1 to n)
      yield (s.toLong, s"c${rnd.nextInt(3)}")
    val df = rows.toDF("subject", "label")
    val r = LabelOps.fleissKappa(df, "subject", "label").collect().head
    // reference: Fleiss 1971 with doubles
    val bySub = rows.groupBy(_._1).values.toSeq
    val N = bySub.size.toDouble
    val pi = bySub.map { ss =>
      val cs = ss.groupBy(_._2).values.map(_.size.toDouble)
      (cs.map(c => c * c).sum - n) / (n * (n - 1.0))
    }
    val pbar = pi.sum / N
    val pj = rows.groupBy(_._2).values.map(_.size.toDouble / (N * n))
    val pe = pj.map(p => p * p).sum
    val kappa = (pbar - pe) / (1 - pe)
    assert(math.abs(r.getLong(4) / 1e6 - kappa) < 1e-5)
    assert(math.abs(r.getLong(2) / 1e6 - pbar) < 1e-5)
    assert(math.abs(r.getLong(3) / 1e6 - pe) < 1e-5)
  }

  test("fleissKappa: unequal rating counts fail loud; one category is NULL") {
    val uneven = Seq((1L, "a"), (1L, "a"), (2L, "a"))
      .toDF("subject", "label")
    intercept[IllegalArgumentException] {
      LabelOps.fleissKappa(uneven, "subject", "label")
    }
    val mono = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("subject", "label")
    val r = LabelOps.fleissKappa(mono, "subject", "label").collect().head
    assert(r.isNullAt(4)) // kappa undefined when chance agreement is 1
  }

  private def alpha(rows: Seq[(Long, String)]) = {
    val r = LabelOps.krippendorffAlpha(
      rows.toDF("unit", "label"), "unit", "label").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("krippendorff: hand case with missing ratings is exact; " +
    "single-rating units are unpairable") {
    // u1 (a,a,b): A = 4, d = 2·10⁶; u2 (a,a): A = 0; u3 (b): excluded
    // n = 5, margins a = 4, b = 1 → chance mass 25 − 17 = 8
    // α = 10⁶ − (4·2·10⁶)/8 = 0 — exactly chance-level
    assert(alpha(Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "a"), (3L, "b"))) ==
      (2L, 5L, 2000000L, 8L, Some(0L)))
  }

  test("krippendorff: perfect agreement is +10^6; systematic " +
    "disagreement goes negative") {
    assert(alpha(Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (2L, "b")))._5.contains(1000000L))
    // two (a,b) units: S = 4·10⁶, n = 4, mass 8 → α = 10⁶ − 1.5·10⁶
    assert(alpha(Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))) ==
      (2L, 4L, 4000000L, 8L, Some(-500000L)))
  }

  test("krippendorff: one-category data has zero chance mass → NULL") {
    assert(alpha(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")))._5.isEmpty)
  }

  test("krippendorff: partitioning invariance") {
    val rnd = new scala.util.Random(8)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(60).toLong, s"c${rnd.nextInt(4)}"))
    val one = alpha(rows)
    val many = {
      val r = LabelOps.krippendorffAlpha(
        rows.toDF("unit", "label").repartition(13), "unit", "label")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(one == many)
  }
}
