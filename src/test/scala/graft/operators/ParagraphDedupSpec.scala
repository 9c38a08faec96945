package graft.operators

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sep = "\n\n"

  private lazy val docs = Seq(
    (1L, Seq("alpha", "BOILER", "one").mkString(sep)),
    (2L, Seq("BOILER", "beta", "two").mkString(sep)),
    (3L, Seq("BOILER", "alpha").mkString(sep)), // everything claimed by doc 1
    (4L, "solo paragraph")
  ).toDF("doc_id", "text")

  private def run() =
    Dedup.paragraphDedup(docs, "doc_id", "text", sep)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("keeps the globally first occurrence and reassembles in order") {
    val got = run()
    assert(got == Seq(
      (1L, 3L, 3L, Seq("alpha", "BOILER", "one").mkString(sep)),
      (2L, 3L, 2L, Seq("beta", "two").mkString(sep)),
      (3L, 2L, 0L, ""),
      (4L, 1L, 1L, "solo paragraph")))
  }

  test("within-doc repeats keep only the first occurrence") {
    val d = Seq((1L, Seq("x", "x", "y").mkString(sep))).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(d, "doc_id", "text", sep)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, Seq("x", "y").mkString(sep))))
  }

  test("null text reports zero paragraphs") {
    val d = Seq((1L, Some("a")), (2L, None))
      .toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(d, "doc_id", "text", sep)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, "a"), (2L, 0L, 0L, "")))
  }

  test("a regex-metacharacter separator is treated literally") {
    val d = Seq((1L, "a|.|b|.|a"), (2L, "b|.|c")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(d, "doc_id", "text", "|.|")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, "a|.|b"), (2L, 2L, 1L, "c")))
  }

  test("result row count always equals input row count") {
    assert(Dedup.paragraphDedup(docs, "doc_id", "text", sep).count() == docs.count())
  }
}
