package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def runPicks(hashes: Seq[Long], w: Int): Seq[(Int, Long)] =
    Seq(Tuple1(hashes)).toDF("hs")
      .select(Winnowing.picks(
        col("hs").cast("array<bigint>"), w).as("p"))
      .as[Seq[(Int, Long)]].head()

  test("picks: window minimum with RIGHTMOST tie, dedup across windows") {
    // windows of 3 over [5,3,3,8,1]:
    //   [5,3,3] -> min 3, tie -> pos 2; [3,3,8] -> pos 2; [3,8,1] -> pos 4
    assert(runPicks(Seq(5L, 3L, 3L, 8L, 1L), 3) == Seq((2, 3L), (4, 1L)))
  }

  test("picks: guarantee — every window contributes; density ~ 2/(w+1)") {
    val rnd = new scala.util.Random(7)
    val hs = Vector.fill(500)(rnd.nextLong().abs)
    val w = 4
    val got = runPicks(hs, w)
    // correctness vs brute force
    val brute = (0 to hs.size - w).map { i =>
      val win = hs.slice(i, i + w)
      val mn = win.min
      val p = (i until i + w).filter(j => hs(j) == mn).max
      (p, mn)
    }.distinct
    assert(got == brute)
    // positions strictly increasing after dedup (winnowing invariant)
    assert(got.map(_._1) == got.map(_._1).sorted.distinct)
    // expected density 2/(w+1) = 0.4; allow a generous band
    assert(got.size > hs.size / 5 && got.size < hs.size * 3 / 5)
  }

  test("picks: fewer hashes than the window → one clipped global-min window") {
    assert(runPicks(Seq(9L, 2L, 7L), 5) == Seq((1, 2L)))
    assert(runPicks(Seq(4L), 5) == Seq((0, 4L)))
    assert(runPicks(Seq.empty, 4) == Seq.empty)
  }

  test("fingerprints: identical text → identical digest; edits change it") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "xy"), // < k tokens: no grams
      (5L, "")).toDF("doc_id", "text")
    val out = Winnowing.fingerprints(df, "doc_id", "text")
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == out(2L).copy(_1 = 1L))
    assert(out(1L)._4 != out(3L)._4)
    assert(out(4L)._2 == 0 && out(4L)._3 == 0 && out(4L)._4.isEmpty)
    assert(out(5L)._2 == 0 && out(5L)._4.isEmpty)
  }

  test("fingerprints: a shared >= w+k-1 token run guarantees a shared pick") {
    // distinct noise, one planted 8-token run (w+k-1 = 6 suffices)
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 b2 $shared b3 b4 b5 b6")).toDF("doc_id", "text")
    // guarantee is on the PICK SET; check via the pick arrays directly
    val hs1 = df.filter(col("doc_id") === 1)
    def pickSet(id: Long) = {
      import graft.functions.TextFunctions.wordShingles
      df.filter(col("doc_id") === id)
        .select(Winnowing.picks(transform(wordShingles(col("text"), 3),
          g => conv(substring(md5(concat(lit("win:"), g)), 1, 15), 16, 10)
            .cast("long")), 4).as("p"))
        .as[Seq[(Int, Long)]].head().map(_._2).toSet
    }
    assert(pickSet(1L).intersect(pickSet(2L)).nonEmpty)
  }

  test("fingerprints: zero-shuffle plan (pure projection)") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = Winnowing.fingerprints(df, "doc_id", "text")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
