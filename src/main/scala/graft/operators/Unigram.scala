package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.UnigramEncode

/** Unigram language-model tokenizer (SentencePiece's other half —
  * Kudo 2018, "Subword Regularization"): where BPE greedily MERGES,
  * unigram starts from a large candidate vocabulary and keeps the
  * pieces that maximize corpus likelihood, segmenting by Viterbi.
  * This is the deterministic hard-EM variant, integer end-to-end:
  *
  *  1. seed: every substring (≤ maxPieceLen code points) of the
  *     capped word-frequency table, scored by occurrence mass; top
  *     `vocabSize` multi-char pieces + ALL single code points
  *     (coverage floor),
  *  2. cost(piece) = floor(−ln(freq/total)·1e6) — quantized negative
  *     log prob, so Viterbi min-cost == max-likelihood,
  *  3. EM rounds: Viterbi-segment the word table under current costs
  *     (hard E-step), re-estimate costs from piece path counts
  *     (M-step); multi-char pieces that win no path are dropped,
  *     single code points always survive (with a floor count of ½)
  *     so coverage never regresses,
  *  4. encode: the fitted (piece, cost) table rides as an expression
  *     constant into [[org.apache.spark.sql.graft.UnigramEncode]] —
  *     a compiled zero-shuffle projection over the corpus.
  *
  * 100 TB shape: the ONLY data-sized stage is the one word-count
  * shuffle (map-side combined); candidate generation and EM run on
  * the driver over the CAPPED word table (control-plane by contract,
  * the [[Pq.train]] sample rule) and the encode pass is per-row
  * compiled. The fitted model replays in the DuckDB oracle as VALUES
  * literals with the exact same DP tie rules — see
  * [[encodeOracleSql]].
  */
object Unigram {

  /** Fitted model: (piece, cost) sorted by piece; `unkCost` is the
    * fallback single-code-point cost for uncovered characters. */
  case class Model(vocab: Seq[(String, Long)], unkCost: Long) {
    def maxLen: Int = UnigramEncode.maxPieceLen(vocab)
    def costs: java.util.HashMap[String, java.lang.Long] =
      UnigramEncode.costTable(vocab)
  }

  /** Characters the trainer never saw cost this much per code point —
    * worse than any real piece (ln pushes real costs well below 1e8
    * for any corpus smaller than e^100). */
  val UnkCost: Long = 100000000L

  private def qcost(num: Long, den: Long): Long =
    math.floor(-math.log(num.toDouble / den.toDouble) * 1e6).toLong

  /** Fit on the corpus's capped word-frequency table. Deterministic:
    * word cap by (count desc, word asc), candidate cut by (mass desc,
    * piece asc), quantized integer costs. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, emRounds: Int = 2,
            maxWords: Int = 2000): Model = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emRounds >= 0)
    import graft.functions.TextFunctions.tokens
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(words.nonEmpty, "empty corpus")
    // candidate mass: every ≤ maxPieceLen-cp substring occurrence
    val mass = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val singles = scala.collection.mutable.Set.empty[String]
    for ((w, cnt) <- words) {
      val cps = UnigramEncode.codePoints(w)
      singles ++= cps
      for (a <- cps.indices; b <- (a + 1) to math.min(cps.length, a + maxPieceLen))
        mass(cps.slice(a, b).mkString) += cnt
    }
    val multis = mass.toSeq
      .filter { case (p, _) => p.codePointCount(0, p.length) >= 2 }
      .sortBy { case (p, m) => (-m, p) }
      .take(vocabSize)
    val pieces: Map[String, Long] =
      (singles.toSeq.map(s => s -> mass(s)) ++ multis).toMap
    val total = pieces.valuesIterator.sum
    var costs = pieces.map { case (p, m) => p -> qcost(m, total) }
    // hard-EM rounds: segment the word table, recount, re-cost
    for (_ <- 1 to emRounds) {
      val table = UnigramEncode.costTable(costs.toSeq)
      val maxLen = UnigramEncode.maxPieceLen(costs.toSeq)
      val pathCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, cnt) <- words) {
        val out = new java.util.ArrayList[String]()
        UnigramEncode.segmentWord(w, table, maxLen, UnkCost, out)
        out.forEach(p => pathCnt(p) += cnt)
      }
      // doubled counts keep the ½ floor integral: real pieces weigh
      // 2·cnt, unused single code points weigh 1 (= ½ a count)
      val kept = costs.keysIterator.flatMap { p =>
        val c = pathCnt(p)
        if (c > 0) Some(p -> 2 * c)
        else if (p.codePointCount(0, p.length) == 1) Some(p -> 1L)
        else None
      }.toMap
      val tot = kept.valuesIterator.sum
      costs = kept.map { case (p, m) => p -> qcost(m, tot) }
    }
    Model(costs.toSeq.sortBy(_._1), UnkCost)
  }

  /** Compiled Viterbi encode over `text` under the fitted model. */
  def encode(text: Column, model: Model): Column =
    UnigramEncode(text, model.vocab, model.unkCost)

  /** Per-word segmentation frame: one row per DISTINCT word of the
    * corpus — (word, n_pieces, cost, pieces). `cost` re-derives the
    * DP total from the vocabulary map (UNK pieces at `unkCost`), so
    * the oracle cross-checks path AND total. */
  def segmentWords(df: DataFrame, textCol: String, model: Model): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val costMap = map_from_arrays(
      typedlit(model.vocab.map(_._1)), typedlit(model.vocab.map(_._2)))
    df.select(explode(tokens(col(textCol))).as("word"))
      .where(col("word") =!= "").distinct()
      .withColumn("__pieces", encode(col("word"), model))
      .select(col("word"),
        size(col("__pieces")).cast("long").as("n_pieces"),
        aggregate(col("__pieces"), lit(0L), (acc, p) =>
          acc + coalesce(element_at(costMap, p), lit(model.unkCost)))
          .as("cost"),
        concat_ws(" ", col("__pieces")).as("pieces"))
      .orderBy("word")
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB replay of [[segmentWords]]: the fitted vocabulary as two
    * parallel list literals, the Viterbi DP as a recursive CTE
    * advancing one code point per step (best/back arrays carried as
    * lists, candidate min via struct-min {'c','j'} — cost then
    * SMALLEST start, the exact [[UnigramEncode.segmentWord]] tie
    * rule, UNK single-char fallback included), then a second
    * recursive CTE walking the backpointers to emit pieces.
    * `docsSql` must yield a `text` column. */
  def encodeOracleSql(docsSql: String, model: Model): String = {
    val vp = model.vocab.map(v => sqlStr(v._1)).mkString("[", ", ", "]")
    val vc = model.vocab.map(_._2).mkString("[", "::BIGINT, ", "::BIGINT]")
    val maxLen = model.maxLen
    val unk = model.unkCost
    s"""WITH RECURSIVE
       |v AS (SELECT $vp AS vp, $vc AS vc),
       |words AS (SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |          FROM ($docsSql) WHERE trim(text) <> ''),
       |dp AS (
       |  SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS best,
       |         [CAST(0 AS BIGINT)] AS back
       |  FROM words WHERE w <> ''
       |  UNION ALL
       |  SELECT w, i + 1,
       |    best || [CASE WHEN len(cands) > 0 THEN list_min(cands)['c']
       |             ELSE best[i + 1] + $unk END],
       |    back || [CASE WHEN len(cands) > 0 THEN list_min(cands)['j']
       |             ELSE CAST(i AS BIGINT) END]
       |  FROM (
       |    SELECT w, i, best, back,
       |      [{'c': best[j + 1] + vc[list_position(vp, array_slice(w, j + 1, i + 1))],
       |        'j': j}
       |       for j in range(greatest(0, i + 1 - $maxLen), i + 1)
       |       if list_position(vp, array_slice(w, j + 1, i + 1)) > 0] AS cands
       |    FROM dp, v WHERE i < len(w))),
       |dpf AS (SELECT w, best, back FROM dp WHERE i = len(w)),
       |walk AS (
       |  SELECT w, CAST(len(w) AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS pieces
       |  FROM dpf
       |  UNION ALL
       |  SELECT k.w, f.back[CAST(k.pos AS INT) + 1] AS pos,
       |    [array_slice(k.w, CAST(f.back[CAST(k.pos AS INT) + 1] AS INT) + 1,
       |                 CAST(k.pos AS INT))] || k.pieces
       |  FROM walk k JOIN dpf f ON f.w = k.w
       |  WHERE k.pos > 0)
       |SELECT k.w AS word, CAST(len(k.pieces) AS BIGINT) AS n_pieces,
       |  CAST(f.best[len(f.w) + 1] AS BIGINT) AS cost,
       |  array_to_string(k.pieces, ' ') AS pieces
       |FROM walk k JOIN dpf f ON f.w = k.w
       |WHERE k.pos = 0
       |ORDER BY word""".stripMargin
  }
}
