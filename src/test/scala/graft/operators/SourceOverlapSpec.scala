package graft.operators

import graft.SparkSpec

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("shingleOverlap: exact shared counts, totals, and jaccard") {
    val docs = Seq(
      ("s1", "a b c d"),       // shingles: "a b c", "b c d"
      ("s2", "a b c e"),       // shingles: "a b c", "b c e"
      ("s3", "x y z w")        // disjoint: "x y z", "y z w"
    ).toDF("source", "text")
    val out = SourceOverlap.shingleOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // only (s1, s2) share: "a b c"
    assert(out.keySet == Set(("s1", "s2")))
    val (shared, aSh, bSh, jq) = out(("s1", "s2"))
    assert(shared == 1 && aSh == 2 && bSh == 2)
    assert(jq == math.floor(1.0 / 3.0 * 1e6).toLong)
  }

  test("shingleOverlap: within-source duplicate shingles count once") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a b c"),  // same shingle twice in s1
      ("s2", "a b c")
    ).toDF("source", "text")
    val out = SourceOverlap.shingleOverlap(docs, "source", "text").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 1 && r.getLong(3) == 1 && r.getLong(4) == 1)
    assert(r.getLong(5) == 1000000L, "identical sets → jaccard 1.0")
  }

  test("shingleOverlap: docs shorter than k shingles contribute nothing") {
    val docs = Seq(("s1", "a b"), ("s2", "a b")).toDF("source", "text")
    assert(SourceOverlap.shingleOverlap(docs, "source", "text").count() == 0)
  }
}
