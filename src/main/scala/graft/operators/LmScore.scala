package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Bigram language-model quality scoring — the perplexity-proxy filter
  * a pretraining pipeline runs before spending GPU time on a document:
  * score every doc by the add-one-smoothed log-probability of its
  * bigrams under a model counted from the corpus itself (or any
  * reference corpus), and gate on the score.
  *
  * Scale shape: training is two map-side-combined count aggregations
  * (unigrams, bigrams); scoring is one explode + two equi-joins on the
  * count tables + one group-back — every stage keyed, nothing
  * quadratic, nothing driver-side. Bigrams come from the compiled
  * [[org.apache.spark.sql.graft.WordShingles]] projection; the context
  * word is a codegen `substring_index`, never a re-tokenize.
  *
  * Cross-engine determinism: each bigram's log-probability is an `ln`
  * of one integer ratio, quantized to `floor(lp·10⁶)` PER BIGRAM and
  * summed as exact integers — so the per-doc score is independent of
  * summation order (float sums are not), and the DuckDB oracle replays
  * it bit-for-bit.
  */
object LmScore {

  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Unigram counts (w, uc) over a corpus. Blank docs contribute
    * nothing (tokens() of blank is empty, not [""]). */
  def unigramCounts(corpus: DataFrame, textCol: String): DataFrame =
    fanOut(corpus).select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uc"))

  /** Bigram counts (bg, bc): bg = the two tokens space-joined. */
  def bigramCounts(corpus: DataFrame, textCol: String): DataFrame =
    fanOut(corpus).select(explode(wordShingles(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("bc"))

  /** Interpolated Kneser–Ney bigram model (absolute discount D = 3/4)
    * — the smoothing that actually wins LM evaluations, vs add-one's
    * crude mass transfer: observed bigrams give up exactly D of their
    * count, and the freed mass backs off to the CONTINUATION
    * probability (how many distinct contexts a word follows — "Kong"
    * is frequent but only ever follows "Hong", so KN correctly
    * refuses to predict it in fresh contexts; a unigram backoff gets
    * this exactly wrong).
    *
    * `P(w₂|w₁) = max(c₁₂−D,0)/c₁ + D·N₁₊(w₁,·)/c₁ · N₁₊(·,w₂)/T`
    * with c₁ = Σ_w c(w₁ w) (context total), N₁₊ the distinct-
    * follower / distinct-predecessor counts and T the distinct bigram
    * types. With D = 3/4 the whole expression is ONE exact rational:
    * `[max(4·c₁₂−3,0)·T + 3·N₁₊(w₁,·)·N₁₊(·,w₂)] / (4·c₁·T)` —
    * floored to ppm in DECIMAL(38), no float anywhere, so the model
    * table hash-matches the DuckDB HUGEINT replay. Magnitude check:
    * c₁₂·T·4·10⁶ stays under 10³⁸ through corpus sizes of 10¹⁵
    * bigram tokens × 10¹⁵ types — loud require far below that.
    *
    * Scale shape: ONE bigram-count aggregation; every derived table
    * (context totals, follower/predecessor type counts) re-aggregates
    * the type-level count table, never the corpus; T is a
    * control-plane scalar. Top-k by raw count bounds the output.
    *
    * Output: `w1, w2, c12, n_follow, n_precede, p_ppm_kn`, top-k by
    * (c12 desc, w1, w2). */
  def kneserNeyBigrams(corpus: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val bi = bigramCounts(corpus, textCol)
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"),
        col("bc").as("c12"))
    val types = bi.count() // distinct bigram types: control-plane scalar
    require(types > 0, "empty corpus: no bigrams to model")
    require(BigInt(types) * 4000000L < BigInt(10).pow(30),
      s"kneserNeyBigrams: $types bigram types risk DECIMAL(38) overflow " +
        "with c12 up to 1e8 — shard the corpus or prune counts first")
    val ctx = bi.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n_follow"))
    val pre = bi.groupBy("w2").agg(count(lit(1)).as("n_precede"))
    val dec = "decimal(38,0)"
    bi.join(ctx, Seq("w1")).join(pre, Seq("w2"))
      .withColumn("p_ppm_kn", expr(
        s"""(CAST(1000000 AS $dec) *
           |  (greatest(4 * c12 - 3, 0) * CAST($types AS $dec)
           |   + 3 * CAST(n_follow AS $dec) * CAST(n_precede AS $dec)))
           | div (4 * CAST(c1 AS $dec) * CAST($types AS $dec))""".stripMargin)
        .cast("long"))
      .select(col("w1"), col("w2"), col("c12"), col("n_follow"),
        col("n_precede"), col("p_ppm_kn"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** DuckDB replica of [[kneserNeyBigrams]] — identical rational,
    * HUGEINT arithmetic. `corpusSql` must yield (text). */
  def kneserNeyOracleSql(corpusSql: String, topK: Int): String =
    s"""WITH tok AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
       |            FROM ($corpusSql) WHERE trim(text) <> ''),
       |bgr AS (SELECT ts[i] AS w1, ts[i+1] AS w2
       |        FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i),
       |bi AS (SELECT w1, w2, CAST(count(*) AS HUGEINT) AS c12
       |       FROM bgr GROUP BY 1, 2),
       |tt AS (SELECT CAST(count(*) AS HUGEINT) AS t FROM bi),
       |ctx AS (SELECT w1, sum(c12) AS c1, CAST(count(*) AS HUGEINT) AS n_follow
       |        FROM bi GROUP BY 1),
       |pre AS (SELECT w2, CAST(count(*) AS HUGEINT) AS n_precede
       |        FROM bi GROUP BY 1)
       |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       |  CAST(n_follow AS BIGINT) AS n_follow,
       |  CAST(n_precede AS BIGINT) AS n_precede,
       |  CAST((1000000 * (greatest(4 * c12 - 3, 0) * t + 3 * n_follow * n_precede))
       |       // (4 * c1 * t) AS BIGINT) AS p_ppm_kn
       |FROM bi JOIN ctx USING (w1) JOIN pre USING (w2) CROSS JOIN tt
       |ORDER BY c12 DESC, w1, w2 LIMIT $topK""".stripMargin

  /** Score every doc: one output row per input doc with
    * `n_bigrams` and `lp_q_sum` = Σ floor(10⁶ · ln((bc+1)/(uc_ctx+V)))
    * over its bigrams (null when the doc has no bigrams). `uni`/`bi`
    * are [[unigramCounts]]/[[bigramCounts]] frames — typically
    * persisted once per reference corpus; `vocabSize` = `uni.count()`.
    * Unseen bigrams/contexts smooth to (0+1)/(0+V). */
  def scoreQuantized(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                     vocabSize: Long, idCol: String, textCol: String): DataFrame = {
    val perBigram = fanOut(docs)
      .select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), 2)).as("bg"))
      .select(col("id"), col("bg"), substring_index(col("bg"), " ", 1).as("w"))
      .join(bi, Seq("bg"), "left")
      .join(uni, Seq("w"), "left")
      .select(col("id"),
        floor(log((coalesce(col("bc"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("uc"), lit(0L)) + vocabSize).cast("double")) * 1e6)
          .cast("long").as("lp_q"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_q").as("lp_q_sum"))
    docs.select(col(idCol).as("id"))
      .join(perBigram, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lp_q_sum"))
  }
}
