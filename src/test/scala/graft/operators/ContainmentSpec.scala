package graft.operators

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("containmentPairs: full containment found where Jaccard fails") {
    val small = "p q r s"                       // shingles: pqr, qrs (2)
    val big = ("p q r s " + (1 to 40).map(i => s"w$i").mkString(" "))
    val docs = Seq((1L, small), (2L, big), (3L, "x y z x y z"))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(docs, "id", "text", thresholdPpm = 800000L)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getLong(2) == 2L, "both of the small doc's shingles shared")
    assert(r.getLong(5) == 1000000L, "small fully contained → 1.0")
    assert(r.getLong(6) < 100000L, "big barely contained in small")
    // the symmetric Jaccard path must NOT see this pair at any
    // comparable threshold — that asymmetry is the operator's point
    val jac = Dedup.ngramJaccardDuplicates(docs, "id", "text", threshold = 0.8)
    assert(jac.count() == 0)
  }

  test("containmentPairs: integer ppm math, threshold is exact") {
    // a: 4 shingles; shares exactly 3 with b → cont_a = 750000 ppm
    val a = "a b c d e f"                        // abc bcd cde def
    val b = "a b c d e zz"                       // abc bcd cde dezz... (abc, bcd, cde, "d e zz")
    val docs = Seq((1L, a), (2L, b)).toDF("id", "text")
    val at75 = Dedup.containmentPairs(docs, "id", "text", thresholdPpm = 750000L).collect()
    assert(at75.length == 1 && at75.head.getLong(5) == 750000L)
    val at76 = Dedup.containmentPairs(docs, "id", "text", thresholdPpm = 750001L)
    assert(at76.count() == 0, "750000 ppm must not pass a 750001 gate")
  }

  test("containmentPairs: disjoint docs emit nothing") {
    val docs = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("id", "text")
    assert(Dedup.containmentPairs(docs, "id", "text").count() == 0)
  }

  test("containmentPairs df-cap: capped ≡ uncapped when cold shingles survive, " +
    "subset with exact scores when the cap bites") {
    // 6 copies of a hot boilerplate tail + distinct heads; every pair
    // shares the 4 boilerplate shingles (df = 6), copies of the same
    // head additionally share cold head shingles (df = 2)
    val boiler = "terms of service apply here"
    val docs = (1 to 6).map { i =>
      (i.toLong, s"head${(i - 1) / 2} alpha beta gamma $boiler")
    }.toDF("id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val uncapped = asMap(
      Dedup.containmentPairs(docs, "id", "text", thresholdPpm = 300000L,
        maxDocFrequency = -1))
    // generous cap: nothing excluded → bit-identical to uncapped
    val generous = asMap(
      Dedup.containmentPairs(docs, "id", "text", thresholdPpm = 300000L,
        maxDocFrequency = 100))
    assert(generous == uncapped)
    // cap below the boilerplate df: only same-head pairs remain
    // candidates, but their emitted scores are the TRUE full-set ones
    val tight = asMap(
      Dedup.containmentPairs(docs, "id", "text", thresholdPpm = 300000L,
        maxDocFrequency = 2))
    assert(tight.nonEmpty && tight.keySet.subsetOf(uncapped.keySet))
    tight.foreach { case (pair, row) => assert(uncapped(pair) == row, s"$pair") }
    assert(tight.keySet == Set((1L, 2L), (3L, 4L), (5L, 6L)),
      "pairs sharing only hot boilerplate are the (documented) lost recall")
  }
}
