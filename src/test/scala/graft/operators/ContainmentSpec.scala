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
}
