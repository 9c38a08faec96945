package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b z z"),
    (3L, ""),            // blank: zero tokens
    (4L, "q r s t")      // all OOV against a small vocab
  ).toDF("doc_id", "text")

  test("build ranks by freq desc then token asc, ids dense from 0") {
    // freqs: a=4, b=3, z=2, c=1, q=r=s=t=1 -> top4 = a,b,z,c (c wins ties lexicographically)
    val v = Vocab.build(docs, "text", 4)
      .orderBy("token_id")
      .select("token", "freq", "token_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("a", 4L, 0L), ("b", 3L, 1L), ("z", 2L, 2L), ("c", 1L, 3L)))
  }

  test("oovStats counts per doc and keeps token-less docs at 0/0") {
    val vocab = Vocab.build(docs, "text", 4)
    val got = Vocab.oovStats(docs, "doc_id", "text", vocab)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc1: 6 tokens, 0 oov; doc2: 4 tokens, 0 oov (a,b,z,z all in vocab);
    // doc3: blank -> split("") yields one empty token in Spark's contract?
    //   tokens("") is empty (trim -> "" -> Array.empty via split semantics)
    // doc4: 4 tokens, 4 oov
    assert(got.find(_._1 == 1L).get == ((1L, 6L, 0L)))
    assert(got.find(_._1 == 2L).get == ((2L, 4L, 0L)))
    assert(got.find(_._1 == 4L).get == ((4L, 4L, 4L)))
    val blank = got.find(_._1 == 3L).get
    assert(blank._2 == blank._3) // n_oov == n_tokens for the blank doc
  }

  test("vocab membership probe broadcasts (corpus never shuffles for it)") {
    val vocab = Vocab.build(docs, "text", 4)
    val plan = Vocab.oovStats(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("build rejects non-positive sizes") {
    intercept[IllegalArgumentException] { Vocab.build(docs, "text", 0) }
  }

  test("goodTuring: hand case — N_r rows, smoothed r*, unseen mass") {
    import spark.implicits._
    // tokens: a x3, b x2, c x1 -> N=6, N1=1
    val df = Seq("a a a b b c").toDF("text")
    val got = Vocab.goodTuring(df, "text")
      .as[(Long, Long, Option[Long], Long)].collect().toList
    assert(got.map(r => (r._1, r._2)) == List((1L, 1L), (2L, 1L), (3L, 1L)))
    val byR = got.map(r => r._1 -> r).toMap
    assert(byR(1L)._3.contains(2000000L)) // r*=2·N2/N1=2
    assert(byR(2L)._3.contains(3000000L)) // r*=3·N3/N2=3
    assert(byR(3L)._3.isEmpty)            // N4=0 -> undefined
    assert(got.forall(_._4 == 166666L))   // p0 = 1/6
  }

  test("goodTuring: maxR caps rows; gramK=2 counts bigram types") {
    import spark.implicits._
    val df = Seq("a b a b c", "a b d").toDF("text")
    // bigrams: "a b" x3, "b a" x1, "b c" x1, "b d" x1 -> N=6, N1=3
    val got = Vocab.goodTuring(df, "text", maxR = 2, gramK = 2)
      .as[(Long, Long, Option[Long], Long)].collect().toList
    assert(got.map(r => (r._1, r._2)) == List((1L, 3L)))
    assert(got.head._4 == 500000L) // p0 = 3/6
  }
}
