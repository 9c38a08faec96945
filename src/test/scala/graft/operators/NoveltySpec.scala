package graft.operators

import graft.SparkSpec

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  test("noveltyProfile counts shingles first seen in this doc") {
    val docs = Seq(
      (1L, "a b c d"),            // shingles: abc, bcd — both novel
      (2L, "a b c d e"),          // abc, bcd seen in 1; cde novel
      (3L, "a b c d"),            // nothing novel
      (4L, "x y"),                // too short: 0/0
      (5L, "p q r")               // pqr novel
    ).toDF("doc_id", "text")
    val got = QualityOps.noveltyProfile(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L), (2L, 3L, 1L), (3L, 2L, 0L), (4L, 0L, 0L), (5L, 1L, 1L)))
  }

  test("duplicate shingles within a doc count once") {
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    // distinct shingles of "a b c a b c": abc, bca, cab, abc -> 3 distinct
    val got = QualityOps.noveltyProfile(docs, "doc_id", "text")
      .as[(Long, Long, Long)].head()
    assert(got == ((1L, 3L, 3L)))
  }
}
