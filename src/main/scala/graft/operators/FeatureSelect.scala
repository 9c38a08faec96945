package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** χ² feature selection: which tokens are most associated with each
  * document label — the classic filter step before training a text
  * classifier (and the fast way to audit what a corpus's "quality" or
  * "domain" labels actually correlate with).
  *
  * For each (token, label), the 2×2 presence contingency table
  * `a` (label ∧ token), `b` (token only), `c` (label only),
  * `d` (neither) gives `χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`.
  * Computed EXACTLY in DECIMAL(38,0) with floor division to
  * milli-units (χ²·1000) — engine-exact, replayed by the DuckDB
  * oracle in HUGEINT. The magnitude contract is enforced loudly (the
  * sigmaOutliers pattern): numerator ≤ N⁵·10³ needs N ≤ 10⁶ docs to
  * stay below 10³⁸ — shard or sample above that (χ² rankings saturate
  * long before a million documents anyway).
  *
  * Scale shape: one distinct over (doc, token) presence pairs, then
  * ONE (token, label) count shuffle; token marginals derive from it
  * by re-aggregation (no second pass over the corpus), label
  * marginals and N are a labels-sized broadcast. Top-k per label is a
  * window over token-ranked groups — label cardinality bounds the
  * partitions, `minDf` prunes the long hapax tail before the window.
  */
object FeatureSelect {

  /** Top-k tokens per label by χ². Output: `label, rank, token,
    * chi2_milli, n_label_tok, n_tok, n_label`, ordered (label, rank).
    */
  def chi2TopTokens(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, k: Int, minDf: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = docs.sparkSession

    // per-doc distinct tokens; ids unique by contract, so (doc, tok)
    // pairs are already distinct — no extra shuffle
    val presence = docs
      .select(col(idCol).as("__doc"), col(labelCol).as("__label"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("__tok"))

    val n = docs.select(col(idCol)).distinct().count()
    require(n <= 1000000L,
      s"chi2TopTokens: $n docs overflow the DECIMAL(38) contract (N <= 1e6); " +
        "shard or sample the corpus first")

    val tokLabel = presence.groupBy("__tok", "__label")
      .agg(count(lit(1)).as("a"))
    val tokTotal = tokLabel.groupBy("__tok")
      .agg(sum("a").as("t"))
      .filter(col("t") >= minDf && col("t") < n)
    val labelTotal = docs.groupBy(col(labelCol).as("__label"))
      .agg(countDistinct(col(idCol)).as("l"))

    val dec = "decimal(38,0)"
    val scored = tokLabel
      .join(tokTotal, Seq("__tok"))
      .join(broadcast(labelTotal), Seq("__label"))
      .withColumn("__N", lit(n))
      // b = t-a, c = l-a, d = N-t-l+a; all nonneg by construction
      .withColumn("__det",
        col("a").cast(dec) * (col("__N") - col("t") - col("l") + col("a")).cast(dec)
          - (col("t") - col("a")).cast(dec) * (col("l") - col("a")).cast(dec))
      .withColumn("chi2_milli", expr(
        s"""(CAST(1000 AS $dec) * CAST(__N AS $dec) * __det * __det)
           | div (CAST(t AS $dec) * CAST(__N - t AS $dec)
           |      * CAST(l AS $dec) * CAST(__N - l AS $dec))""".stripMargin)
        .cast("long"))

    val w = Window.partitionBy(col("__label"))
      .orderBy(col("chi2_milli").desc, col("__tok").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__label").as("label"), col("rank").cast("long").as("rank"),
        col("__tok").as("token"), col("chi2_milli"),
        col("a").as("n_label_tok"), col("t").as("n_tok"), col("l").as("n_label"))
      .orderBy("label", "rank")
  }

  /** DuckDB replica of [[chi2TopTokens]] (HUGEINT arithmetic).
    * `docsSql` must yield (id, text, label) under those names;
    * `tokSplitSql` is the engine-matched tokenizer over `text`. */
  def chi2OracleSql(docsSql: String, tokSplitSql: String, k: Int,
                    minDf: Long = 2L): String =
    s"""WITH docs AS ($docsSql),
       |nn AS (SELECT CAST(count(DISTINCT id) AS HUGEINT) AS n FROM docs),
       |presence AS (
       |  SELECT id, label, unnest(list_distinct($tokSplitSql)) AS tok
       |  FROM docs),
       |tl AS (SELECT tok, label, CAST(count(*) AS HUGEINT) AS a
       |       FROM presence GROUP BY 1, 2),
       |tt AS (SELECT tok, sum(a) AS t FROM tl GROUP BY 1),
       |lt AS (SELECT label, CAST(count(DISTINCT id) AS HUGEINT) AS l
       |       FROM docs GROUP BY 1),
       |scored AS (
       |  SELECT tl.label, tl.tok, tl.a, tt.t, lt.l,
       |    (1000 * n * (a * (n - t - l + a) - (t - a) * (l - a))
       |            * (a * (n - t - l + a) - (t - a) * (l - a)))
       |      // (t * (n - t) * l * (n - l)) AS chi2_milli
       |  FROM tl JOIN tt USING (tok) JOIN lt USING (label) CROSS JOIN nn
       |  WHERE tt.t >= $minDf AND tt.t < n),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY label ORDER BY chi2_milli DESC, tok ASC) AS rank
       |  FROM scored)
       |SELECT label, CAST(rank AS BIGINT) AS rank, tok AS token,
       |  CAST(chi2_milli AS BIGINT) AS chi2_milli,
       |  CAST(a AS BIGINT) AS n_label_tok, CAST(t AS BIGINT) AS n_tok,
       |  CAST(l AS BIGINT) AS n_label
       |FROM ranked WHERE rank <= $k ORDER BY label, rank""".stripMargin
}
