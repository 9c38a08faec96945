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

  test("scrubSpans: windows expand, merge by gap, and cut exactly") {
    val doc = "w0 w1 SECRET A B w5 w6 w7 w8 w9 SECRET A B w13"
    val tr = Seq((1L, doc), (2L, "nothing shared here at all")).toDF("doc_id", "text")
    val te = Seq((9L, "x SECRET A B y")).toDF("doc_id", "text")
    val out = Decontaminate.scrubSpans(tr, te, "doc_id", "text",
      n = 3, window = 1)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // matches at positions 2 and 10; gap 8 > n+2w=5 -> TWO spans
    // [1,6) and [9,14): kept indices 0,6,7,8
    assert(out(1L) == ((1L, 14L, 2L, 10L, "w0 w6 w7 w8")))
    // untouched doc: zero spans, full text preserved (token-joined)
    assert(out(2L) == ((2L, 5L, 0L, 0L, "nothing shared here at all")))

    // closer repeats MERGE into one span: matches at 2 and 6, gap 4 <= 5
    val doc2 = "w0 w1 SECRET A B w5 SECRET A B w9 w10"
    val out2 = Decontaminate.scrubSpans(
      Seq((1L, doc2)).toDF("doc_id", "text"), te, "doc_id", "text",
      n = 3, window = 1)
      .as[(Long, Long, Long, Long, String)].head()
    // one span [1, 10): kept 0, 10
    assert(out2 == ((1L, 11L, 1L, 9L, "w0 w10")))

    // window 0: only the exact n-gram token ranges go
    val out0 = Decontaminate.scrubSpans(
      Seq((1L, doc2)).toDF("doc_id", "text"), te, "doc_id", "text",
      n = 3, window = 0)
      .as[(Long, Long, Long, Long, String)].head()
    // spans [2,5) and [6,9): kept 0,1,5,9,10
    assert(out0 == ((1L, 11L, 2L, 6L, "w0 w1 w5 w9 w10")))

    // layout-independent
    val again = Decontaminate.scrubSpans(tr.repartition(7), te, "doc_id",
      "text", n = 3, window = 1)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(again == out.values.toSet)
  }

  // ---------------------------------------------- fuzzy (MinHash) probe

  private lazy val fuzzyTrain = Seq(
    (1L, "one two three four five six seven eight"),
    (2L, "totally unrelated words about other things here"),
    (3L, "one two three four five six seven eight nine") // near-dup of 1
  ).toDF("doc_id", "text")

  test("nearDuplicateReport surfaces edited copies across corpora") {
    // test doc = train doc 1 with one word changed at the end
    val fuzzyTest = Seq((100L, "one two three four five six seven NINE"))
      .toDF("doc_id", "text")
    val got = Decontaminate.nearDuplicateReport(
      fuzzyTrain, fuzzyTest, "doc_id", "text", threshold = 0.4,
      bands = 8, rowsPerBand = 2)
      .select("train_id", "test_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 100L)))       // the edited source
    assert(!got.exists(_._1 == 2L))        // the unrelated doc stays clean
    val shuffled = Decontaminate.nearDuplicateReport(
      fuzzyTrain, fuzzyTest, "doc_id", "text", threshold = 0.4,
      bands = 8, rowsPerBand = 2, broadcastTest = false)
      .select("train_id", "test_id").as[(Long, Long)].collect().toSet
    assert(shuffled == got)
  }

  test("nearDuplicateReport jaccard agrees with the exact set jaccard") {
    val fuzzyTest = Seq((100L, "one two three four five six seven eight"))
      .toDF("doc_id", "text") // identical to train doc 1
    val got = Decontaminate.nearDuplicateReport(
      fuzzyTrain, fuzzyTest, "doc_id", "text", threshold = 0.1)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got((1L, 100L)) == 1.0)
    // doc 3 shares 6 of its 7 3-shingles with the 6-shingle test doc:
    // |inter|=6, |union|=7 -> 6/7
    assert(math.abs(got((3L, 100L)) - 6.0 / 7.0) < 1e-15)
  }
}
