package graft.operators

import graft.SparkSpec

class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private def refGini(vals: Seq[Long]): Long = {
    val sorted = vals.sorted
    val n = BigInt(sorted.size)
    val total = sorted.map(BigInt(_)).sum
    val six = sorted.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
    ((six * 2 - (n + 1) * total) * 1000000 / (n * total)).toLong
  }

  test("gini ≡ sorted-rank reference across bucket widths; invariant to ties") {
    val rnd = new scala.util.Random(13)
    val vals = (1 to 500).map(_ => rnd.nextInt(100000).toLong) ++
      Seq.fill(50)(7777L) // tie block
    val df = vals.toDF("v")
    for (w <- Seq(1L, 97L, 10000L, 10000000L)) {
      val got = Diversity.gini(df, "v", w)
        .as[(Long, Long, Long)].collect().head
      assert(got == ((vals.size.toLong, vals.sum, refGini(vals))), s"w=$w")
    }
  }

  test("gini: uniform → 0, extreme concentration → (n−1)/n") {
    val eq = Seq.fill(100)(42L).toDF("v")
    assert(Diversity.gini(eq, "v", 10L)
      .as[(Long, Long, Long)].collect().head._3 == 0L)
    val conc = (Seq.fill(99)(0L) :+ 1000L).toDF("v")
    // all mass on one row: G = (n-1)/n = 0.99
    assert(Diversity.gini(conc, "v", 10L)
      .as[(Long, Long, Long)].collect().head._3 == 990000L)
  }

  test("simpson: monoculture → 0, perfectly even k categories → 1−(n/k−1)/(n−1)") {
    val mono = Seq.fill(50)(("g", "a")).toDF("g", "c")
    assert(Diversity.simpson(mono, Seq("g"), "c")
      .as[(String, Long, Long, Long)].collect().head._4 == 0L)
    // 4 categories × 25 each, n=100: D = 1 − 4·25·24/(100·99) = 1 − 2400/9900
    val even = (0 until 100).map(i => ("g", s"c${i % 4}")).toDF("g", "c")
    val d = Diversity.simpson(even, Seq("g"), "c")
      .as[(String, Long, Long, Long)].collect().head
    assert(d == (("g", 4L, 100L, (BigInt(9900 - 2400) * 1000000 / 9900).toLong)))
  }

  private def refTv(a: Map[String, Long], b: Map[String, Long]): Long = {
    val na = BigInt(a.values.sum); val nb = BigInt(b.values.sum)
    val num = (a.keySet ++ b.keySet).toSeq.map { t =>
      (BigInt(a.getOrElse(t, 0L)) * nb - BigInt(b.getOrElse(t, 0L)) * na).abs
    }.sum
    (num * 1000000 / (2 * na * nb)).toLong
  }

  test("tvMatrix ≡ reference; identical → 0; disjoint → 10^6") {
    val rnd = new scala.util.Random(37)
    val cats = (0 until 20).map(i => s"c$i")
    val groups = Map(
      "g1" -> (1 to 300).map(_ => cats(rnd.nextInt(10))),
      "g2" -> (1 to 200).map(_ => cats(5 + rnd.nextInt(10))),
      "g3" -> (1 to 250).map(_ => cats(10 + rnd.nextInt(10))), // disjoint from g1
      "g4" -> (1 to 300).map(_ => cats(rnd.nextInt(10))))
    val df = groups.toSeq.flatMap { case (g, cs) => cs.map((g, _)) }.toDF("g", "c")
    val got = Diversity.tvMatrix(df, "g", "c")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got.size == 6)
    for (Seq(ga, gb) <- groups.keys.toSeq.sorted.combinations(2)) {
      val ca = groups(ga).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val cb = groups(gb).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got((ga, gb)) ==
        ((groups(ga).size.toLong, groups(gb).size.toLong, refTv(ca, cb))),
        s"($ga,$gb)")
    }
    assert(got(("g1", "g3"))._3 == 1000000L) // disjoint supports
    val same = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("g", "c")
    assert(Diversity.tvMatrix(same, "g", "c")
      .as[(String, String, Long, Long, Long)].collect().head._5 == 0L)
  }
}
