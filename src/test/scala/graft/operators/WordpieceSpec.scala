package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWord: the textbook greedy longest-match example") {
    val vocab = Seq("un", "##aff", "##able", "u", "n", "a", "f", "b", "l", "e",
      "##a", "##f", "##b", "##l", "##e", "##n")
    assert(Wordpiece.encodeWord("unaffable", vocab)
      == Vector("un", "##aff", "##able"))
    // longest match wins at every position, not just the first
    assert(Wordpiece.encodeWord("unfab", vocab)
      == Vector("un", "##f", "##a", "##b"))
  }

  test("encodeWord: whole-word UNK on any dead end; empty word") {
    val vocab = Seq("a", "##b")
    assert(Wordpiece.encodeWord("ab", vocab) == Vector("a", "##b"))
    // 'c' unmatched mid-word -> the WHOLE word is one UNK, not a prefix
    assert(Wordpiece.encodeWord("acb", vocab) == Vector(Wordpiece.Unk))
    // bare 'b' missing: 'b' at position 0 has no bare piece
    assert(Wordpiece.encodeWord("b", vocab) == Vector(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("", vocab) == Vector(Wordpiece.Unk))
  }

  test("trainFromCounts: likelihood score picks the rarer-symbol pair over the frequent one") {
    // words: "xy" x9, "zw" x6, "zq" x6 — pair counts: (x,##y)=9,
    // (z,##w)=6, (z,##q)=6. Frequency (BPE) would pick (x,##y).
    // Likelihood: score(x,##y) = 9/(9*9) = 1/9;
    // score(z,##w) = 6/(12*6) = 1/12 < 1/9 -> WordPiece also picks
    // (x,##y) here. Flip it: make x very common as a single.
    val counts = Seq(("xy", 9L), ("zw", 6L), ("zq", 6L), ("x", 50L))
    // now score(x,##y) = 9/(59*9) = 1/59 < score(z,##w) = score(z,##q)
    // = 6/(12*6) = 1/12; the z-pair tie breaks on the smaller right
    // symbol: ("z","##q") -> product "zq"
    val vocab = Wordpiece.trainFromCounts(counts, numMerges = 1)
    assert(vocab.contains("zq")) // likelihood winner via tie-break
    assert(!vocab.contains("xy"))
    // base symbols all present and sorted first
    assert(vocab.take(5) == Seq("##q", "##w", "##y", "x", "z"))
  }

  test("trainFromCounts: continuation chains fuse with correct ## status") {
    // single word "aaa" -> a ##a ##a. Pair scores: (a,##a) =
    // 5/(5·10) = 1/10 BEATS (##a,##a) = 5/(10·10) = 1/20 — the
    // likelihood objective at work (symbol 'a' is rarer than '##a').
    // Product "aa" keeps the bare left status; merge 2 fuses
    // (aa,##a) -> "aaa".
    val v1 = Wordpiece.trainFromCounts(Seq(("aaa", 5L)), 1)
    assert(v1.contains("aa") && !v1.contains("##aa"))
    val v2 = Wordpiece.trainFromCounts(Seq(("aaa", 5L)), 2)
    assert(v2.contains("aa") && v2.contains("aaa"))
  }

  test("compiled expression ≡ driver replica on randomized words; UNK and blank text") {
    val vocab = Seq("a", "b", "c", "ab", "abc", "##a", "##b", "##c",
      "##ab", "##bc", "##abc")
    val rnd = new scala.util.Random(31)
    val words = (0 until 300).map { _ =>
      (0 until (1 + rnd.nextInt(8))).map(_ => "abcd" (rnd.nextInt(4))).mkString
    } :+ "" :+ "abcabc" :+ "dddd"
    val texts = words.grouped(7).map(_.mkString(" ")).toSeq
    val got = texts.toDF("text")
      .select(Wordpiece.encode(col("text"), vocab).as("p"))
      .collect().map(_.getSeq[String](0))
    val expected = texts.map(_.split("\\s+").filter(_.nonEmpty)
      .flatMap(w => Wordpiece.encodeWord(w, vocab)).toSeq)
    assert(got.toSeq.map(_.toList) == expected.map(_.toList))
  }

  test("non-UNK encodings reconstruct the word; the projection is shuffle-free") {
    val vocab = Wordpiece.trainFromCounts(
      Seq(("hello", 3L), ("help", 2L), ("hold", 2L)), numMerges = 4)
    for (w <- Seq("hello", "help", "hold", "hhoe")) {
      val enc = Wordpiece.encodeWord(w, vocab)
      if (!enc.contains(Wordpiece.Unk))
        assert(enc.map(_.stripPrefix("##")).mkString == w, w)
    }
    val df = Seq("hello help").toDF("text")
      .select(Wordpiece.encode(col("text"), vocab).as("p"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("train end-to-end over a DataFrame corpus is deterministic") {
    val docs = Seq.fill(4)("the cat sat on the mat").toDF("text")
    val a = Wordpiece.train(docs, "text", numMerges = 3)
    val b = Wordpiece.train(docs.repartition(5), "text", numMerges = 3)
    assert(a == b && a.nonEmpty)
  }
}
