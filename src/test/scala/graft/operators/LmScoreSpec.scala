package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM scoring: counts, smoothing, the quantized-sum contract,
  * and the filtering property (in-domain text outscores gibberish). */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran to the mat"),
    (3L, "the dog sat on the rug"),
    (4L, ""),          // blank: no tokens, no bigrams
    (5L, "single"))    // one token: no bigrams
    .toDF("doc_id", "text")

  private lazy val uni = LmScore.unigramCounts(corpus, "text")
  private lazy val bi = LmScore.bigramCounts(corpus, "text")
  private lazy val vocab = uni.count()

  test("unigram and bigram counts are exact") {
    val u = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u("the") == 6L && u("cat") == 2L && u("single") == 1L)
    assert(!u.contains(""))
    val b = bi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b("the cat") == 2L && b("sat on") == 2L && b("cat ran") == 1L)
  }

  test("score rows cover every doc; blank and 1-token docs score null") {
    val out = LmScore.scoreQuantized(corpus, uni, bi, vocab, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(4L) == (0L, None) && out(5L) == (0L, None))
    assert(out(1L)._1 == 5L && out(1L)._2.isDefined)
  }

  test("per-bigram quantization: score matches a hand fold and is exact") {
    // doc 1 bigrams (bc, uc_ctx): the cat (2, the=6), cat sat (1, cat=2),
    // sat on (2, sat=2), on the (2, on=2), the mat (2, the=6)
    val expected = Seq(
      (2L, 6L), (1L, 2L), (2L, 2L), (2L, 2L), (2L, 6L)).map { case (bc, uc) =>
      math.floor(math.log((bc + 1).toDouble / (uc + vocab).toDouble) * 1e6).toLong
    }.sum
    val got = LmScore.scoreQuantized(corpus, uni, bi, vocab, "doc_id", "text")
      .filter($"id" === 1L).head().getLong(2)
    assert(got == expected)
  }

  test("in-domain text outscores gibberish per bigram") {
    val probes = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "zxq vbn mmw qqp zzl aap"))
      .toDF("doc_id", "text")
    val out = LmScore.scoreQuantized(probes, uni, bi, vocab, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
    assert(out(10L) > out(11L))
  }

  test("score is independent of partitioning (integer sums)") {
    val a = LmScore.scoreQuantized(corpus, uni, bi, vocab, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = LmScore.scoreQuantized(corpus.repartition(7), uni.repartition(3),
        bi.repartition(5), vocab, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("kneserNeyBigrams: hand-replayed rational on a tiny corpus") {
    // corpus: "a b", "a b", "a c", "d b" →
    // bigram types: (a,b) c12=2, (a,c) 1, (d,b) 1 → T = 3
    // ctx a: c1=3, n_follow=2; ctx d: c1=1, n_follow=1
    // pre b: n_precede=2; pre c: 1
    val c = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b"))
      .toDF("doc_id", "text")
    val out = LmScore.kneserNeyBigrams(c, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // P(b|a) = [max(8-3,0)*3 + 3*2*2] / (4*3*3) = 27/36 = 0.75
    assert(out(("a", "b")) == ((2L, 2L, 2L, 750000L)))
    // P(c|a) = [1*3 + 3*2*1] / 36 = 9/36 = 0.25
    assert(out(("a", "c")) == ((1L, 2L, 1L, 250000L)))
    // P(b|d) = [1*3 + 3*1*2] / (4*1*3) = 9/12 = 0.75
    assert(out(("d", "b")) == ((1L, 1L, 2L, 750000L)))
  }

  test("kneserNeyBigrams: probabilities over a context sum to <= 1 (mass conservation)") {
    val c = Seq((1L, "x y z x y w x z y x"), (2L, "y x w z z y"),
      (3L, "w w x y z")).toDF("doc_id", "text")
    val out = LmScore.kneserNeyBigrams(c, "text", topK = 100).collect()
    val byCtx = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(5)).sum).toMap
    byCtx.foreach { case (w1, total) =>
      // floor-rounding only ever loses mass; with every w2 the context
      // has SEEN, discounted+continuation mass stays below 1 (the
      // remainder belongs to unseen continuations)
      assert(total <= 1000000L, s"context $w1 exceeds unit mass: $total ppm")
    }
    // the corpus' richest context keeps most of its mass (sanity floor)
    assert(byCtx.values.max > 500000L)
  }

  test("kneserNeyBigrams: continuation beats raw frequency for one-context words") {
    // 'kong' is frequent but ONLY follows 'hong'; 'tea' is rarer but
    // follows many contexts → for a context that never saw either,
    // the continuation term must favor 'tea'-like words. Compare the
    // backoff parts: n_precede drives them.
    val c = Seq(
      (1L, "hong kong hong kong hong kong hong kong"),
      (2L, "green tea black tea iced tea sweet tea")).toDF("doc_id", "text")
    val out = LmScore.kneserNeyBigrams(c, "text", topK = 100)
      .collect().map(r => (r.getString(1), r.getLong(4))).distinct.toMap
    assert(out("tea") == 4L && out("kong") == 1L,
      "distinct-predecessor counts must expose the Kong pathology")
  }
}
