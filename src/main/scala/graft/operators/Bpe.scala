package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer: the training half that
  * [[org.apache.spark.sql.graft.BpeEncode]]'s scaladoc promises, plus
  * pure driver-side replicas of the encode pass for specs and oracle
  * generation.
  *
  * Training is the classic merge-table learner (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — a public algorithm): start from words split into code
  * points, repeatedly merge the most frequent adjacent symbol pair,
  * emit the merge list in learned order. The reference pipeline has no
  * tokenizer (its token counts are whitespace splits); BPE is the
  * training-data-pipeline extension, the same role the dedup/quality
  * operators play.
  *
  * Spark-first split of labor:
  *  - the CORPUS-SIZED work — exact word frequencies — is one
  *    distributed aggregation (explode → groupBy → count), the only
  *    pass over the data;
  *  - the LEARNER runs on the driver over the top-`maxVocab` word
  *    frequency table (bounded, control-plane sized: ≤ maxVocab rows
  *    regardless of corpus size). This is not a shortcut: merge
  *    learning is inherently sequential (merge i+1's counts depend on
  *    merge i having been applied), so the scalable formulation is
  *    "reduce the corpus to a bounded sufficient statistic, then
  *    iterate on the driver" — the same shape as k-means centroids or
  *    the temperature-resample thresholds.
  *  - ENCODING (the corpus-sized inference pass) is the compiled
  *    shuffle-free [[org.apache.spark.sql.graft.BpeEncode]] projection
  *    with the learned table riding along as an expression constant.
  *
  * Determinism: word counts are exact integers; the pair argmax
  * tie-breaks on the lexicographically smallest (left, right); the
  * vocabulary truncation orders by (count desc, word asc). Same
  * corpus → same merge table, on any cluster layout, any engine.
  */
object Bpe {

  /** Learn `numMerges` merges from a text column.
    *
    * EAGER: runs the word-count aggregation (one Spark job) at call
    * time.
    *
    * @param maxVocab learn from the `maxVocab` most frequent words
    *                 (ties by word) — bounds driver memory; rare-tail
    *                 words beyond it contribute no pair counts, the
    *                 standard truncation in practical BPE trainers
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 10000): Seq[(String, String)] = {
    require(numMerges >= 1, "need numMerges >= 1")
    trainFromCounts(wordCounts(df, textCol, maxVocab), numMerges)
  }

  /** The bounded word-frequency table both [[train]] and
    * [[vocabularyFromCorpus]] reduce the corpus to: top `maxVocab`
    * words by (count desc, word asc). One distributed aggregation;
    * collected because the result is control-plane sized. */
  private def wordCounts(df: DataFrame, textCol: String,
                         maxVocab: Int): Seq[(String, Long)] = {
    require(maxVocab >= 1, "need maxVocab >= 1")
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The sequential learner over a word-frequency table — public so
    * specs can hand-replay it against tiny corpora. Stops early when
    * no adjacent pair remains (every word fused to one symbol). */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): Seq[(String, String)] = {
    var vocab = wordCounts.map { case (w, n) => (splitCodePoints(w), n) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; j <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + n))
      if (pairCounts.isEmpty) done = true
      else {
        // max count; ties -> lexicographically smallest (left, right)
        val best = pairCounts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, n) => (applyMerge(syms, best), n) }
        i += 1
      }
    }
    merges.result()
  }

  /** One full left-to-right pass of a single merge over a symbol
    * sequence (how training updates its working vocabulary). */
  private def applyMerge(syms: Vector[String],
                         m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += syms(j) + syms(j + 1)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Code-point symbols (surrogate pairs stay whole) — the same
    * initial segmentation [[org.apache.spark.sql.graft.BpeEncode]]
    * uses. */
  def splitCodePoints(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Pure driver-side replica of the expression's per-word encode:
    * repeatedly merge the FIRST occurrence of the lowest-rank adjacent
    * pair. The differential spec pins this against the compiled
    * expression; oracle generators use it to build closed-form word →
    * subwords tables. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.groupBy(_._1).map { case (p, xs) => p -> xs.head._2 }
    var syms = splitCodePoints(word)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = syms.patch(bestAt, Seq(syms(bestAt) + syms(bestAt + 1)), 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Whole-text encode: whitespace words, each BPE-encoded, subwords
    * concatenated in order — the corpus-sized inference pass as a
    * compiled shuffle-free projection. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeEncode(text, merges)

  /** Deterministic subword → id vocabulary: base symbols sorted
    * ascending take ids 0..B−1, then each merge's product in learned
    * rank order (first occurrence wins when a product collides with an
    * existing entry). Same (baseSymbols, merges) → same ids anywhere. */
  def vocabulary(merges: Seq[(String, String)],
                 baseSymbols: Seq[String]): Seq[String] =
    (baseSymbols.distinct.sorted ++ merges.map { case (l, r) => l + r }).distinct

  /** [[vocabulary]] with base symbols drawn from the corpus: the
    * distinct code points of the `maxVocab` most frequent words — the
    * same bounded frequency table [[train]] learns from, so train +
    * vocabulary stay consistent by construction. Code points absent
    * from it encode as the UNK id downstream (no byte fallback — the
    * honest simple contract).
    *
    * EAGER: runs the word-count aggregation at call time. */
  def vocabularyFromCorpus(df: DataFrame, textCol: String,
                           merges: Seq[(String, String)],
                           maxVocab: Int = 10000): Seq[String] =
    vocabulary(merges,
      wordCounts(df, textCol, maxVocab).flatMap(w => splitCodePoints(w._1)))

  /** Token IDS in one compiled shuffle-free projection: encode, then
    * map each subword through the fixed vocabulary (OOV → `unkId`)
    * inside the expression — no explode, no join, no O(|V|) literal
    * scan per token. */
  def encodeIds(text: Column, merges: Seq[(String, String)],
                vocab: Seq[String], unkId: Int = -1): Column =
    org.apache.spark.sql.graft.BpeEncodeIds(text, merges, vocab, unkId)

  /** Pure driver-side replica of [[encodeIds]]'s per-word mapping for
    * specs and oracle generation. */
  def encodeWordIds(word: String, merges: Seq[(String, String)],
                    vocab: Seq[String], unkId: Int = -1): Vector[Int] = {
    val ids = vocab.zipWithIndex.groupBy(_._1).map { case (s, xs) => s -> xs.head._2 }
    encodeWord(word, merges).map(s => ids.getOrElse(s, unkId))
  }
}
