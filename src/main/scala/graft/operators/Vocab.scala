package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Corpus vocabulary construction and out-of-vocabulary statistics —
  * the tokenizer-adjacent bookkeeping of a training-data pipeline
  * (vocab coverage gates, OOV-rate quality filters, id assignment for
  * downstream packing).
  *
  * Scale shape: frequency counting is one explode + map-side-combined
  * groupBy shuffle on the token; top-V selection is a distributed
  * `TakeOrderedAndProject` (never a global sort of the full token
  * universe); only the V winning rows pass through the id-assigning
  * window. The OOV probe broadcasts the (V-sized) vocabulary, so the
  * corpus is never shuffled for membership — only the per-doc count
  * aggregation shuffles, keyed on the doc id.
  */
object Vocab {

  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Top-`size` tokens by corpus frequency (ties broken
    * lexicographically), with dense rank ids 0..size-1 in that order:
    * (token, freq, token_id). The id window runs over only the `size`
    * surviving rows — vocabulary-sized, not corpus-sized. */
  def build(df: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"vocab size must be positive, got $size")
    fanOut(df)
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(size)
      .withColumn("token_id",
        (row_number().over(Window.orderBy(col("freq").desc, col("token")))
          - 1).cast("long"))
  }

  /** Per-document token and OOV counts against a vocabulary (any
    * DataFrame with a `token` column, e.g. [[build]]'s output):
    * (idCol, n_tokens, n_oov). Documents with no tokens (blank text)
    * report 0/0 rather than disappearing. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val stats = fanOut(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_oov"))
  }

  /** Good–Turing frequency-of-frequencies profile: N_r = number of
    * token TYPES seen exactly r times, the Turing estimate of UNSEEN
    * mass p₀ = N₁/N (how much of the true distribution this corpus has
    * not captured — the "is more crawling worth it" number), and the
    * smoothed count r* = (r+1)·N_{r+1}/N_r (Good 1953) whose ratio to
    * r says how much a raw count overstates its true probability.
    *
    * All exact integers: p0_ppm = (10⁶·N₁) div N,
    * r_star_ppm = (10⁶·(r+1)·N_{r+1}) div N_r — NULL where N_{r+1}=0
    * (the raw estimator is undefined there; smoothing fills would be
    * model choices, not statistics).
    *
    * 100 TB shape: one token-count shuffle, one count-of-counts
    * aggregate over the VOCABULARY (type-sized, not token-sized), a
    * self-join on r+1 over the tiny frequency histogram, and a
    * broadcast 1-row total. Output rows = distinct frequencies ≤
    * `maxR` plus the constant p₀ riding along.
    *
    * @param gramK type unit: 1 = unigram tokens, k>1 = word k-gram
    *              shingles (the right unit when the unigram vocabulary
    *              is tiny and saturated)
    * @return (r, n_types, r_star_ppm, p0_ppm) for r = 1..maxR with
    *         N_r > 0, ordered by r
    */
  def goodTuring(df: DataFrame, textCol: String, maxR: Int = 10,
                 gramK: Int = 1): DataFrame = {
    require(maxR >= 1, "need maxR >= 1")
    require(gramK >= 1, "need gramK >= 1")
    val units =
      if (gramK == 1) tokens(col(textCol))
      else graft.functions.TextFunctions.wordShingles(col(textCol), gramK)
    val freqs = fanOut(df)
      .select(explode(units).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__f"))
      .transform(Materialize.once) // histogram + total both read it
    val hist = freqs.groupBy(col("__f").as("r"))
      .agg(count(lit(1)).as("n_types"))
    val total = freqs.agg(sum(col("__f")).as("__N"),
      sum(when(col("__f") === 1, 1L).otherwise(0L)).as("__N1"))
    hist.filter(col("r") <= maxR)
      .join(hist.select((col("r") - 1).as("r"), col("n_types").as("__next")),
        Seq("r"), "left")
      .crossJoin(broadcast(total))
      .select(col("r"), col("n_types"),
        when(col("__next").isNotNull,
          expr("(1000000 * (r + 1) * __next) div n_types")).as("r_star_ppm"),
        expr("(1000000 * __N1) div __N").as("p0_ppm"))
      .orderBy("r")
  }

  /** DuckDB replay of [[goodTuring]] over `docsSql` rows (text). */
  def goodTuringOracleSql(docsSql: String, maxR: Int = 10,
                          gramK: Int = 1): String = {
    val unitsSql =
      if (gramK == 1)
        s"""SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
           |    FROM ($docsSql) WHERE length(trim(text)) > 0""".stripMargin
      else
        s"""SELECT unnest([array_to_string(ts[i:i + ${gramK - 1}], ' ')
           |      for i in range(1, len(ts) - ${gramK - 2})]) AS token
           |    FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
           |          FROM ($docsSql) WHERE length(trim(text)) > 0)
           |    WHERE len(ts) >= $gramK""".stripMargin
    s"""WITH f AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS fr FROM (
       |    $unitsSql) GROUP BY token),
       |h AS MATERIALIZED (
       |  SELECT fr AS r, CAST(count(*) AS BIGINT) AS n_types
       |  FROM f GROUP BY fr),
       |t AS (SELECT CAST(sum(fr) AS BIGINT) AS NT,
       |        CAST(sum(CASE WHEN fr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS N1
       |      FROM f)
       |SELECT h.r, h.n_types,
       |  CASE WHEN nx.n_types IS NOT NULL
       |    THEN (1000000 * (h.r + 1) * nx.n_types) // h.n_types END AS r_star_ppm,
       |  (1000000 * N1) // NT AS p0_ppm
       |FROM h LEFT JOIN h nx ON nx.r = h.r + 1, t
       |WHERE h.r <= $maxR ORDER BY h.r""".stripMargin
  }
}
