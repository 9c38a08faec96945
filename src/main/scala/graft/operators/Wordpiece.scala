package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** WordPiece tokenizer (Schuster & Nakajima, ICASSP 2012 — the BERT
  * vocabulary family): the third production tokenizer next to q104's
  * BPE and q204's Unigram-LM, completing the space a training-data
  * pipeline chooses from. Two public halves:
  *
  *  - TRAINING is BPE's merge loop with the LIKELIHOOD objective:
  *    each round fuses the adjacent symbol pair maximizing
  *    score(l,r) = count(l,r) / (count(l)·count(r)) — the pair whose
  *    fusion most improves a unigram LM's corpus likelihood — instead
  *    of raw pair frequency. Non-initial symbols carry the `##`
  *    continuation prefix; the merge product keeps the LEFT symbol's
  *    prefix status. Scores are exact rationals compared by BigInt
  *    cross-multiplication (c₁·cl₂·cr₂ vs c₂·cl₁·cr₁) — no float, no
  *    ordering drift; ties break on the lexicographically smallest
  *    (l, r).
  *  - ENCODING is greedy longest-match-first against the vocabulary
  *    SET (merge order irrelevant at inference — the standard
  *    deployment form), compiled shuffle-free as
  *    [[org.apache.spark.sql.graft.WordpieceEncode]]; a word with no
  *    match at any position becomes one `[UNK]` token (whole-word UNK,
  *    the reference behavior).
  *
  * Spark-first split of labor — identical to [[Bpe]]: the corpus-sized
  * work is ONE distributed word-count aggregation; the inherently
  * sequential merge learner runs on the driver over that bounded
  * table; the corpus-sized encode pass is a compiled projection.
  */
object Wordpiece {

  val Unk = "[UNK]"

  /** Learn a WordPiece vocabulary from a text column: base symbols
    * (bare first-code-points + `##`-prefixed continuations, sorted)
    * followed by `numMerges` merge products in learned order.
    *
    * EAGER: runs the word-count aggregation (one Spark job) at call
    * time. `maxVocab` bounds the driver-side frequency table like
    * [[Bpe.train]]. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 10000): Seq[String] = {
    require(numMerges >= 1, "need numMerges >= 1")
    val counts = df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, numMerges)
  }

  /** The sequential likelihood-scored learner over a word-frequency
    * table — public so specs can hand-replay it. Returns base symbols
    * (sorted) ++ merge products (learned order, first occurrence
    * wins). Stops early when no adjacent pair remains. */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): Seq[String] = {
    var vocab = wordCounts.map { case (w, n) => (splitInitial(w), n) }
    val base = vocab.flatMap(_._1).distinct.sorted
    val products = Seq.newBuilder[String]
    var done = vocab.isEmpty
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = collection.mutable.Map.empty[(String, String), Long]
      val symCounts = collection.mutable.Map.empty[String, Long]
      for ((syms, n) <- vocab) {
        for (s <- syms)
          symCounts.updateWith(s)(c => Some(c.getOrElse(0L) + n))
        for (j <- 0 until syms.length - 1)
          pairCounts.updateWith((syms(j), syms(j + 1)))(
            c => Some(c.getOrElse(0L) + n))
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max likelihood score c_lr/(c_l·c_r), exact cross-multiplied;
        // ties -> lexicographically smallest (left, right)
        val best = pairCounts.toSeq.reduceLeft { (x, y) =>
          val sx = BigInt(x._2) * symCounts(y._1._1) * symCounts(y._1._2)
          val sy = BigInt(y._2) * symCounts(x._1._1) * symCounts(x._1._2)
          if (sx > sy || (sx == sy && implicitly[Ordering[(String, String)]]
            .lt(x._1, y._1))) x else y
        }._1
        products += merged(best._1, best._2)
        vocab = vocab.map { case (syms, n) => (applyMerge(syms, best), n) }
        i += 1
      }
    }
    (base ++ products.result()).distinct
  }

  /** Initial segmentation: first code point bare, continuations
    * `##`-prefixed — the WordPiece convention. */
  def splitInitial(word: String): Vector[String] = {
    val cps = Bpe.splitCodePoints(word)
    if (cps.isEmpty) cps
    else cps.head +: cps.tail.map("##" + _)
  }

  /** Merge product: the right side is always a continuation, whose
    * `##` marker fuses away; the left side keeps its prefix status. */
  private def merged(l: String, r: String): String = l + r.stripPrefix("##")

  private def applyMerge(syms: Vector[String],
                         m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += merged(m._1, m._2)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Whole-text encode as the compiled shuffle-free projection. */
  def encode(text: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.graft.WordpieceEncode(text, vocab, Unk)

  /** Pure driver-side replica of the expression's greedy
    * longest-match-first per-word encode (an INDEPENDENT
    * implementation — the differential spec pins the compiled
    * expression against it; oracle generation and hand-replays use
    * it). */
  def encodeWord(word: String, vocab: Seq[String]): Vector[String] = {
    val set = vocab.toSet
    val out = Vector.newBuilder[String]
    var pos = 0
    var dead = false
    while (pos < word.length && !dead) {
      val cands = (1 to (word.length - pos)).reverse.iterator
        .map { len =>
          if (pos == 0) word.substring(0, len)
          else "##" + word.substring(pos, pos + len)
        }
        .find(set.contains)
      cands match {
        case Some(p) =>
          out += p
          pos += (if (pos == 0) p.length else p.length - 2)
        case None => dead = true
      }
    }
    if (dead || word.isEmpty) Vector(Unk) else out.result()
  }

  /** DuckDB replica of the encode pass as per-doc statistics:
    * `docsSql` must yield (doc_id, text); output is
    * (doc_id, n_words, n_subwords, n_unk) ordered by doc_id. The
    * greedy longest-match loop replays as a recursive CTE over the
    * DISTINCT corpus words with the vocabulary as a list literal —
    * a foreign re-implementation, not shared code. */
  def encodeStatsOracleSql(docsSql: String, vocab: Seq[String]): String = {
    val vs = vocab.map(p => "'" + p.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    // consumed characters per matching piece: bare pieces at pos 1,
    // ##-stripped continuations elsewhere; greedy = list_max
    val cands =
      s"""[CASE WHEN pos = 1 THEN len(p) ELSE len(p) - 2 END for p in $vs
         |  if CASE WHEN pos = 1
         |     THEN p[1:2] <> '##' AND p = w[1:len(p)]
         |     ELSE p[1:2] = '##' AND len(p) > 2
         |          AND p[3:] = w[pos:pos+len(p)-3] END]""".stripMargin
    s"""WITH RECURSIVE
       |docs AS ($docsSql),
       |words AS (SELECT doc_id,
       |    unnest(CASE WHEN text IS NULL OR trim(text) = ''
       |      THEN []::VARCHAR[]
       |      ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
       |  FROM docs),
       |wvocab AS (SELECT DISTINCT w FROM words WHERE w <> ''),
       |wp AS (
       |  SELECT w, 1 AS pos, 0 AS np, 0 AS unk FROM wvocab
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN best IS NULL THEN len(w) + 1 ELSE pos + best END AS pos,
       |    CASE WHEN best IS NULL THEN 1 ELSE np + 1 END AS np,
       |    CASE WHEN best IS NULL THEN 1 ELSE unk END AS unk
       |  FROM (SELECT w, pos, np, unk,
       |          list_max($cands) AS best
       |        FROM wp WHERE pos <= len(w) AND unk = 0)),
       |fin AS (SELECT w, np AS n_pieces, unk FROM wp WHERE pos > len(w)),
       |agg AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(f.n_pieces) AS BIGINT) AS n_subwords,
       |    CAST(sum(f.unk) AS BIGINT) AS n_unk
       |  FROM words JOIN fin f USING (w) WHERE w <> '' GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_words, 0) AS n_words,
       |  COALESCE(a.n_subwords, 0) AS n_subwords,
       |  COALESCE(a.n_unk, 0) AS n_unk
       |FROM docs d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}
