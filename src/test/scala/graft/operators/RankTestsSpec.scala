package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteU2(a: Seq[Long], b: Seq[Long]): Long =
    // 2·U_a = 2·#{x_a > x_b} + #{ties}, by definition
    a.map(x => 2L * b.count(_ < x) + b.count(_ == x)).sum

  private def bruteKsPpm(a: Seq[Long], b: Seq[Long]): Long = {
    val vals = (a ++ b).distinct
    val na = a.length.toLong; val nb = b.length.toLong
    val dmax = vals.map(v =>
      math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)).max
    dmax * 1000000L / (na * nb)
  }

  test("mannWhitney ≡ brute-force pair count, ties by midrank") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(120)(rnd.nextInt(40).toLong) // heavy ties
    val b = Seq.fill(90)(rnd.nextInt(40).toLong + 5)
    val df = (a.map(("g1", _)) ++ b.map(("g2", _))).toDF("g", "v")
    for (w <- Seq(1L, 7L, 1000L)) {
      val r = RankTests.mannWhitney(df, "g", "v", w).head()
      assert(r.getString(0) == "g1" && r.getString(1) == "g2")
      assert(r.getLong(2) == 120L && r.getLong(3) == 90L)
      assert(r.getLong(4) == bruteU2(a, b), s"bucketWidth=$w")
      assert(r.getLong(5) == bruteU2(a, b) * 1000000L / (2L * 120 * 90))
    }
  }

  test("mannWhitney identities: U_a + U_b = n_a·n_b; identical groups at half") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(60)(rnd.nextInt(25).toLong)
    val b = Seq.fill(40)(rnd.nextInt(25).toLong)
    val df = (a.map(("x", _)) ++ b.map(("y", _))).toDF("g", "v")
    val u2a = RankTests.mannWhitney(df, "g", "v", 5L).head().getLong(4)
    val flipped = (a.map(("z", _)) ++ b.map(("y", _))).toDF("g", "v")
    // after flip group "y" sorts first, so u2_a is group b's statistic
    val u2b = RankTests.mannWhitney(flipped, "g", "v", 5L).head().getLong(4)
    assert(u2a + u2b == 2L * 60 * 40)
    val same = (a.map(("x", _)) ++ a.map(("y", _))).toDF("g", "v")
    assert(RankTests.mannWhitney(same, "g", "v", 5L).head().getLong(5)
      == 500000L)
  }

  test("ksTwoSample ≡ brute-force ECDF sup across bucket widths") {
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(80)(rnd.nextInt(50).toLong)
    val b = Seq.fill(110)(rnd.nextInt(50).toLong + 10)
    val df = (a.map(("p", _)) ++ b.map(("q", _))).toDF("g", "v")
    for (w <- Seq(1L, 9L, 10000L)) {
      val r = RankTests.ksTwoSample(df, "g", "v", w).head()
      assert(r.getLong(2) == 80L && r.getLong(3) == 110L)
      assert(r.getLong(4) == bruteKsPpm(a, b), s"bucketWidth=$w")
    }
  }

  test("ksTwoSample: disjoint supports reach 10^6; identical samples 0") {
    val a = Seq(1L, 2L, 3L); val b = Seq(10L, 11L)
    val dfDisj = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    assert(RankTests.ksTwoSample(dfDisj, "g", "v", 4L).head().getLong(4)
      == 1000000L)
    val dfSame = (a.map(("a", _)) ++ a.map(("b", _))).toDF("g", "v")
    assert(RankTests.ksTwoSample(dfSame, "g", "v", 4L).head().getLong(4) == 0L)
  }

  private def aucAll(rows: Seq[(String, Long)], w: Long = 10L) =
    RankTests.aucOneVsRest(rows.toDF("g", "v"), "g", "v", w)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap

  test("aucOneVsRest: hand cases — separation, all-tied, mixed ties") {
    val sep = aucAll(Seq(("a", 10L), ("a", 11L), ("b", 1L), ("b", 2L)))
    assert(sep("a") == ((2L, 2L, 8L, 1000000L))) // u2 = 2·n_a·n_b
    assert(sep("b") == ((2L, 2L, 0L, 0L)))
    val tied = aucAll(Seq(("a", 5L), ("a", 5L), ("b", 5L)))
    assert(tied("a") == ((2L, 1L, 2L, 500000L)))
    assert(tied("b") == ((1L, 2L, 2L, 500000L)))
    // a = {1,3,3} vs rest {2,3}: U = 2 wins + 2 half-ties = 3 -> u2 = 6
    val mixed = aucAll(
      Seq(("a", 1L), ("a", 3L), ("a", 3L), ("b", 2L), ("b", 3L)))
    assert(mixed("a") == ((3L, 2L, 6L, 500000L)))
    assert(mixed("b") == ((2L, 3L, 6L, 500000L)))
  }

  test("aucOneVsRest: agrees with mannWhitney on the 2-group case and with brute force on 3 groups") {
    val rnd = new scala.util.Random(17)
    val a = Seq.fill(70)(rnd.nextInt(30).toLong)
    val b = Seq.fill(50)(rnd.nextInt(30).toLong + 4)
    val two = (a.map(("g1", _)) ++ b.map(("g2", _))).toDF("g", "v")
    val mw = RankTests.mannWhitney(two, "g", "v", 7L).head()
    val ovr = aucAll(a.map(("g1", _)) ++ b.map(("g2", _)), 7L)
    assert(ovr("g1")._3 == mw.getLong(4)) // u2 identical
    assert(ovr("g1")._4 == mw.getLong(5)) // cles == one-vs-rest auc
    // 3 groups: each group's u2 vs the pooled rest, brute-forced
    val c = Seq.fill(30)(rnd.nextInt(30).toLong + 8)
    val groups = Map("g1" -> a, "g2" -> b, "g3" -> c)
    val got = aucAll(groups.toSeq.flatMap { case (k, vs) => vs.map((k, _)) })
    groups.foreach { case (k, vs) =>
      val rest = (groups - k).values.flatten.toSeq
      assert(got(k)._3 == bruteU2(vs, rest), k)
    }
  }

  test("aucOneVsRest: bucket-width independence, single group NULL auc, null drops") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 150).map(i => (s"g${i % 4}", rnd.nextInt(60).toLong))
    val w1 = aucAll(rows, 1L)
    assert(aucAll(rows, 13L) == w1 && aucAll(rows, 100000L) == w1)
    val single = RankTests.aucOneVsRest(
      Seq(("only", 1L), ("only", 2L)).toDF("g", "v"), "g", "v", 10L)
      .collect()
    assert(single.length == 1 && single.head.isNullAt(4))
    val withNulls = RankTests.aucOneVsRest(
      Seq((Some("a"), Some(1L)), (Some("a"), None), (None, Some(5L)),
        (Some("b"), Some(2L))).toDF("g", "v"), "g", "v", 10L).collect()
    assert(withNulls.map(_.getLong(1)).sum == 2L)
  }

  test("null values and null groups are dropped; 3 groups rejected") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), None), (None, Some(5L)),
      (Some("b"), Some(2L)), (Some("b"), Some(3L))
    ).toDF("g", "v")
    val r = RankTests.mannWhitney(df, "g", "v", 10L).head()
    assert(r.getLong(2) == 1L && r.getLong(3) == 2L)
    val three = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RankTests.mannWhitney(three, "g", "v", 10L)
    }
    intercept[IllegalArgumentException] {
      RankTests.ksTwoSample(three, "g", "v", 10L)
    }
  }
}
