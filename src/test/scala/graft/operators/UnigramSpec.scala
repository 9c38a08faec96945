package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.UnigramEncode

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "concatenation of the catalog",
    "mat cat the the the").toDF("text")

  /** Independent reference Viterbi: brute-force ALL segmentations of a
    * word (words here are short), min by (cost, pieces-from-longest-
    * last... ) — replicated tie rule: lowest cost, then at every DP
    * position the longest final piece. Implemented as memo-free
    * recursion over suffixes to stay structurally different from the
    * production DP. */
  private def bruteSegment(word: String, costs: Map[String, Long],
                           unk: Long): (Seq[String], Long) = {
    val cps = UnigramEncode.codePoints(word).toSeq
    def candidatesAt(i: Int): Seq[(Int, Long)] = { // (j, pieceCost) ending at i
      val inVocab = (0 until i).flatMap { j =>
        costs.get(cps.slice(j, i).mkString).map(c => (j, c))
      }
      if (inVocab.nonEmpty) inVocab else Seq((i - 1, unk))
    }
    // forward DP replicated independently (best + smallest-j tie)
    val best = Array.fill(cps.length + 1)(Long.MaxValue)
    val back = Array.fill(cps.length + 1)(-1)
    best(0) = 0
    for (i <- 1 to cps.length; (j, c) <- candidatesAt(i))
      if (best(j) != Long.MaxValue && best(j) + c < best(i)) {
        best(i) = best(j) + c; back(i) = j
      }
    val pieces = Iterator.iterate(cps.length)(back(_)).takeWhile(_ > 0)
      .map(i => cps.slice(back(i), i).mkString).toSeq.reverse
    (pieces, best(cps.length))
  }

  test("train is deterministic; pieces reconstruct every word") {
    val a = Unigram.train(corpus, "text", vocabSize = 20)
    val b = Unigram.train(corpus, "text", vocabSize = 20)
    assert(a == b)
    val seg = Unigram.segmentWords(corpus, "text", a)
      .select("word", "pieces").as[(String, String)].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (w, p) =>
      assert(p.split(" ").mkString == w, s"pieces must rebuild '$w', got '$p'")
    }
  }

  test("segmentWords == independent brute-force Viterbi (cost + path + ties)") {
    val m = Unigram.train(corpus, "text", vocabSize = 20)
    val costs = m.vocab.toMap
    val got = Unigram.segmentWords(corpus, "text", m)
      .as[(String, Long, Long, String)].collect()
    got.foreach { case (w, nPieces, cost, pieces) =>
      val (wantPieces, wantCost) = bruteSegment(w, costs, m.unkCost)
      assert(pieces.split(" ").toSeq == wantPieces, s"path for '$w'")
      assert(cost == wantCost, s"cost for '$w'")
      assert(nPieces == wantPieces.size)
    }
  }

  test("EM round hand-replay: round-1 costs = recount of round-0 Viterbi paths") {
    val m0 = Unigram.train(corpus, "text", vocabSize = 20, emRounds = 0)
    val m1 = Unigram.train(corpus, "text", vocabSize = 20, emRounds = 1)
    // replay the M-step by hand from m0: segment the word table under
    // m0 costs, recount (doubled counts, ½ floor for unused singles)
    val words = corpus.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .where($"w" =!= "").groupBy("w").count()
      .as[(String, Long)].collect()
    val cnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val table = UnigramEncode.costTable(m0.vocab)
    words.foreach { case (w, c) =>
      val out = new java.util.ArrayList[String]()
      UnigramEncode.segmentWord(w, table, m0.maxLen, m0.unkCost, out)
      out.forEach(p => cnt(p) += c)
    }
    val kept = m0.vocab.flatMap { case (p, _) =>
      if (cnt(p) > 0) Some(p -> 2 * cnt(p))
      else if (p.codePointCount(0, p.length) == 1) Some(p -> 1L)
      else None
    }
    val tot = kept.map(_._2).sum
    val want = kept.map { case (p, c) =>
      p -> math.floor(-math.log(c.toDouble / tot.toDouble) * 1e6).toLong
    }.sortBy(_._1)
    assert(m1.vocab == want)
  }

  test("unknown characters segment via UNK single code points at unkCost") {
    val m = Unigram.train(corpus, "text", vocabSize = 20)
    // fully-known word costs far less than one containing unk chars
    val grid = Unigram.segmentWords(Seq("qqzar the").toDF("text"), "text", m)
      .as[(String, Long, Long, String)].collect()
    val byWord = grid.map(r => r._1 -> r).toMap
    assert(byWord("qqzar")._4.split(" ").mkString == "qqzar")
    assert(byWord("qqzar")._3 > byWord("the")._3)
  }
}
