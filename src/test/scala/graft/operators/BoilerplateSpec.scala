package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val Banner = "one two three four five" // exactly one 5-gram

  private def stats(rows: Seq[(Long, String, String)],
                    fracPpm: Long = 500000L, minDf: Long = 2L) =
    Boilerplate.frequentNgramStats(
      rows.toDF("id", "grp", "text"), "id", "text", "grp", 5, fracPpm, minDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap

  test("template shared by enough of the group flags; unique text does not") {
    // group a: banner in 2 of 4 docs (50% ≥ 50%, df 2 ≥ 2) → boiler
    val out = stats(Seq(
      (1L, "a", s"$Banner alpha beta gamma delta"),
      (2L, "a", s"$Banner epsilon zeta eta theta"),
      (3L, "a", "iota kappa lambda mu nu xi"),
      (4L, "a", "omicron pi rho sigma tau upsilon")))
    // doc 1: 5 tokens of banner + 4 own = 9 tokens → 5 shingles; the
    // banner 5-gram itself is the only flagged one
    assert(out(1L) == ((5L, 1L, Some(200000L))))
    assert(out(2L) == ((5L, 1L, Some(200000L))))
    assert(out(3L)._2 == 0L && out(4L)._2 == 0L)
  }

  test("threshold boundary is inclusive; minDf floor excludes small groups") {
    // banner in 2 of 3 docs: 66% ≥ 50% and df 2 — flagged; the docs'
    // own unique shingles (df 1, 33% < 50%) are not
    val rows = Seq(
      (1L, "b", s"$Banner a b c d"),
      (2L, "b", s"$Banner e f g h"),
      (3L, "b", "i j k l m n"))
    assert(stats(rows)(1L)._2 == 1L)
    // raising the absolute floor above the df excludes it again even
    // though the fraction still passes
    assert(stats(rows, minDf = 3L)(1L)._2 == 0L)
  }

  test("groups are independent; short docs emit NULL ppm") {
    val out = stats(Seq(
      (1L, "a", s"$Banner x y z w"),
      (2L, "a", s"$Banner p q r t"),
      (3L, "b", s"$Banner x y z w"), // df 1 in b: not boiler there
      (4L, "b", "tiny doc")))        // < 5 tokens → no shingles
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L)
    assert(out(3L)._2 == 0L)
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("occurrences count repeats, not membership") {
    // the banner appears twice in doc 1 → both occurrences tally
    val out = stats(Seq(
      (1L, "a", s"$Banner $Banner"),
      (2L, "a", s"$Banner only here")))
    assert(out(1L)._2 >= 2L)
  }

  test("partitioning invariance") {
    val rows = (1L to 40L).map(i => (i, s"g${i % 3}",
      if (i % 2 == 0) s"$Banner word$i extra$i more$i tail$i"
      else s"word$i extra$i more$i tail$i pad$i end$i"))
    // 40% gate: ~46% of each mod-3 group carries the banner → flagged
    val one = stats(rows, fracPpm = 400000L)
    assert(one.values.exists(_._2 > 0L), "fixture must flag something")
    val many = Boilerplate.frequentNgramStats(
      rows.toDF("id", "grp", "text").repartition(7),
      "id", "text", "grp", 5, 400000L, 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(one == many)
  }
}
