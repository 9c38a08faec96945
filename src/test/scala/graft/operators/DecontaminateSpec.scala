package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // test doc holds "the quick brown fox"; train docs 1 and 2 overlap on
  // a 3-gram, doc 3 shares words but no 3-gram, doc 4 is disjoint
  private lazy val train = Seq(
    (1L, "the quick brown fox jumps high"),      // shares 2 grams
    (2L, "we saw the quick brown fox"),          // shares 2 grams
    (3L, "quick fox brown the runs"),            // words yes, 3-grams no
    (4L, "completely different text entirely"),
    (5L, "a b")                                  // too short for 3-grams
  ).toDF("doc_id", "text")
  private lazy val testCorpus = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")

  test("overlapReport counts distinct shared n-grams per train doc") {
    val got = Decontaminate.overlapReport(train, testCorpus, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // test 3-grams: {the quick brown, quick brown fox}
    assert(got == Map(1L -> 2L, 2L -> 2L))
  }

  test("decontaminate drops exactly the contaminated docs; shuffle variant agrees") {
    val clean = Decontaminate.decontaminate(train, testCorpus, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(3L, 4L, 5L))
    val shuffled = Decontaminate.decontaminate(train, testCorpus, "doc_id", "text",
      n = 3, broadcastTest = false).select("doc_id").as[Long].collect().toSet
    assert(shuffled == clean)
  }

  test("the test-gram probe broadcasts (train corpus never shuffles for it)") {
    val plan = Decontaminate.overlapReport(train, testCorpus, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
