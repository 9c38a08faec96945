package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sentence-level BLEU (Papineni et al. 2002) over (candidate,
  * reference) text pairs — the machine-translation / generation eval
  * metric, and in a curation pipeline the scorer for paraphrase /
  * distillation filtering (keep a generated rewrite only if its BLEU
  * against the source stays inside a band — too high = verbatim copy,
  * too low = semantic drift).
  *
  * Definitions (single reference):
  *   p_n  = clipped_n / total_n   (modified n-gram precision, n = 1..N)
  *   BP   = min(1, e^(1 − r/c))   (brevity penalty; c = cand len, r = ref len)
  *   BLEU = BP · (Π p_n)^(1/N)
  *
  * Cross-engine discipline (the BM25/PMI quantize-then-sum rule):
  * every count is an exact integer; each ln(p_n) floor-quantizes to
  * 10⁻⁶ units BEFORE the sum; the brevity exponent (r−c)/c — an exact
  * rational — quantizes by positive integer floor division (so the
  * emitted `deficit_micro` is the magnitude, floor-quantized, of the
  * log-BP term). The one final transcendental (`exp`) is applied to an
  * argument both engines assemble from identical integers, and its
  * result is floor-quantized — one float boundary, same as every
  * ln-scored operator in the battery.
  *
  * 100 TB shape: identical to [[Rouge]] — the whole metric is a
  * compiled per-row projection (tokenize, shingle, clipped multiset
  * intersection as one higher-order fold). Zero shuffle, zero explode,
  * zero UDF; the join that produced the pairs upstream is the only
  * exchange.
  */
object Bleu {

  /** Per-pair BLEU-N report. Appends, for each n in 1..maxN,
    * `clipped_n` / `total_n` (exact LONGs), plus:
    *  - `len_c`, `len_r` — token counts;
    *  - `deficit_micro` — the log-brevity-penalty magnitude in 10⁻⁶
    *    units: ((r−c)·10⁶) div c when c < r else 0; NULL when c = 0;
    *  - `lnp_sum_micro` — Σ_n floor(10⁶·ln(p_n)); NULL when any p_n is
    *    zero or undefined (the standard zero-BLEU cases);
    *  - `bleu_micro` — floor(10⁶·BLEU); exactly 0 in the zero cases.
    * NULL text counts as zero tokens (the [[Rouge.rougeN]] guard). */
  def bleuReport(pairs: DataFrame, candCol: String, refCol: String,
                 maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    def grams(src: Column, n: Int): Column = coalesce(
      if (n == 1) TextFunctions.tokens(src)
      else TextFunctions.wordShingles(src, n),
      array().cast("array<string>"))

    val withCounts = (1 to maxN).foldLeft(
      pairs
        .withColumn("len_c", size(grams(col(candCol), 1)).cast("long"))
        .withColumn("len_r", size(grams(col(refCol), 1)).cast("long"))) {
      (df, n) =>
        df.withColumn(s"clipped_$n",
            Rouge.clippedOverlap(grams(col(candCol), n),
              grams(col(refCol), n)).cast("long"))
          .withColumn(s"total_$n",
            greatest(lit(0L), col("len_c") - lit(n - 1L)))
    }
    val lnpTerms = (1 to maxN).map { n =>
      when(col(s"clipped_$n") > 0 && col(s"total_$n") > 0,
        floor(log(col(s"clipped_$n").cast("double") /
          col(s"total_$n").cast("double")) * 1e6).cast("long"))
    }
    withCounts
      .withColumn("deficit_micro",
        when(col("len_c") === 0, lit(null).cast("long"))
          .otherwise(when(col("len_c") < col("len_r"),
            expr("((len_r - len_c) * 1000000L) div len_c"))
            .otherwise(lit(0L))))
      .withColumn("lnp_sum_micro",
        lnpTerms.reduce(_ + _)) // SQL +: any NULL term nulls the sum
      .withColumn("bleu_micro",
        when(col("lnp_sum_micro").isNull || col("deficit_micro").isNull,
          lit(0L))
          .otherwise(floor(
            exp((col("lnp_sum_micro").cast("double") * lit(1e-6)) / lit(maxN.toDouble)
              - col("deficit_micro").cast("double") * lit(1e-6)) * 1e6)
            .cast("long")))
  }

  /** DuckDB replica of [[bleuReport]]: `pairsSql` must yield
    * (doc_id, cand_text, ref_text); output matches the Spark columns
    * keyed by doc_id, ordered by doc_id. */
  def bleuOracleSql(pairsSql: String, maxN: Int = 4): String = {
    val gramCtes = (1 to maxN).map { n =>
      val gexpr =
        if (n == 1) "unnest(%s)"
        else s"unnest([array_to_string(%s[i:i+${n - 1}], ' ') " +
          s"for i in range(1, len(%s) - ${n - 2})])"
      s"""cg$n AS (SELECT doc_id, g, count(*) AS c FROM
         |  (SELECT doc_id, ${gexpr.replace("%s", "cts")} AS g FROM base) GROUP BY 1, 2),
         |rg$n AS (SELECT doc_id, g, count(*) AS c FROM
         |  (SELECT doc_id, ${gexpr.replace("%s", "rts")} AS g FROM base) GROUP BY 1, 2),
         |ov$n AS (SELECT cg$n.doc_id,
         |    CAST(sum(least(cg$n.c, rg$n.c)) AS BIGINT) AS ov
         |  FROM cg$n JOIN rg$n ON cg$n.doc_id = rg$n.doc_id AND cg$n.g = rg$n.g
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val clippedCols = (1 to maxN).map { n =>
      s"""  CAST(COALESCE(o$n.ov, 0) AS BIGINT) AS clipped_$n,
         |  CAST(greatest(0, b.len_c - ${n - 1}) AS BIGINT) AS total_$n""".stripMargin
    }.mkString(",\n")
    val ovJoins = (1 to maxN)
      .map(n => s"LEFT JOIN ov$n o$n ON o$n.doc_id = b.doc_id")
      .mkString("\n")
    val lnpTerms = (1 to maxN).map { n =>
      s"""CASE WHEN COALESCE(o$n.ov, 0) > 0 AND b.len_c - ${n - 1} > 0
         |  THEN CAST(floor(ln(CAST(o$n.ov AS DOUBLE) /
         |    CAST(b.len_c - ${n - 1} AS DOUBLE)) * 1000000.0) AS BIGINT)
         |  ELSE NULL END""".stripMargin
    }.mkString(" +\n")
    s"""WITH pairs AS ($pairsSql),
       |base AS (SELECT doc_id,
       |    CASE WHEN cand_text IS NULL OR trim(cand_text) = '' THEN []::VARCHAR[]
       |      ELSE regexp_split_to_array(trim(cand_text), '\\s+') END AS cts,
       |    CASE WHEN ref_text IS NULL OR trim(ref_text) = '' THEN []::VARCHAR[]
       |      ELSE regexp_split_to_array(trim(ref_text), '\\s+') END AS rts
       |  FROM pairs),
       |lens AS (SELECT doc_id, cts, rts,
       |    CAST(len(cts) AS BIGINT) AS len_c,
       |    CAST(len(rts) AS BIGINT) AS len_r FROM base),
       |$gramCtes,
       |rep AS (SELECT b.doc_id, b.len_c, b.len_r,
       |$clippedCols,
       |  CASE WHEN b.len_c = 0 THEN NULL
       |    WHEN b.len_c < b.len_r THEN (b.len_r - b.len_c) * 1000000 // b.len_c
       |    ELSE 0 END AS deficit_micro,
       |  $lnpTerms AS lnp_sum_micro
       |FROM lens b
       |$ovJoins)
       |SELECT doc_id, len_c, len_r,
       |  ${(1 to maxN).map(n => s"clipped_$n, total_$n").mkString(", ")},
       |  CAST(deficit_micro AS BIGINT) AS deficit_micro,
       |  CAST(lnp_sum_micro AS BIGINT) AS lnp_sum_micro,
       |  CAST(CASE WHEN lnp_sum_micro IS NULL OR deficit_micro IS NULL THEN 0
       |    ELSE floor(exp((CAST(lnp_sum_micro AS DOUBLE) * 1e-6) / ${maxN}.0
       |      - CAST(deficit_micro AS DOUBLE) * 1e-6) * 1000000.0) END
       |    AS BIGINT) AS bleu_micro
       |FROM rep
       |ORDER BY doc_id""".stripMargin
  }
}
