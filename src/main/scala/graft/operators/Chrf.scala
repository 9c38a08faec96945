package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** chrF (Popović, WMT 2015) over (candidate, reference) text pairs —
  * the character-n-gram F-score that completes the generation-eval
  * trio next to [[Bleu]] and [[Rouge]]: tokenization-free (no
  * whitespace heuristics to disagree on), morphology-sensitive, and
  * the WMT-standard sentence metric for non-English targets. In a
  * curation pipeline it is the paraphrase / transcription scorer of
  * choice for languages where word-level BLEU under-credits.
  *
  * Definitions (chrF-β, single reference; n = 1..N character n-grams
  * over the texts with ALL whitespace removed, the sacreBLEU default):
  *   P     = avg over n with cand n-grams of (clipped_n / cand_n)
  *   R     = avg over n with ref  n-grams of (clipped_n / ref_n)
  *   chrFβ = (1+β²)·P·R / (β²·P + R)
  *
  * Cross-engine discipline — STRONGER than BLEU's: every quantity is
  * an exact integer end-to-end. Per-n precision/recall floor-quantize
  * to ppm by integer division (ov·10⁶ div cnt), the averages are
  * integer div by the valid-order count, and the harmonic combine
  * (1+β²)·P·R div (β²·P + R) stays inside LONG (P, R ≤ 10⁶ ⇒
  * numerator ≤ (1+β²)·10¹²). Zero float boundary, zero
  * transcendentals — both engines assemble identical integers.
  *
  * 100 TB shape: identical to [[Rouge]]/[[Bleu]] — the whole metric
  * is a compiled per-row projection (whitespace strip, char-shingle,
  * clipped multiset intersection as one higher-order fold). Zero
  * shuffle, zero explode, zero UDF; the join that produced the pairs
  * upstream is the only exchange.
  */
object Chrf {

  /** Per-pair chrF-β report. Appends, for each n in 1..maxN, exact
    * LONGs `ov_n` (clipped char-n-gram overlap), `nc_n` / `nr_n`
    * (candidate / reference n-gram totals), plus:
    *  - `len_c`, `len_r` — whitespace-stripped character counts;
    *  - `avg_p_ppm` / `avg_r_ppm` — mean per-order precision / recall
    *    in ppm (per-order value = ov·10⁶ div cnt; mean = integer div
    *    by the count of orders with cnt > 0); NULL when no order has
    *    any n-gram on that side;
    *  - `chrf_ppm` — (1+β²)·P·R div (β²·P+R) over the ppm averages;
    *    exactly 0 when either side is NULL/zero (the empty-text and
    *    zero-overlap cases), exactly 10⁶ for identical texts.
    * NULL text counts as empty (the [[Rouge.rougeN]] guard). */
  def chrfReport(pairs: DataFrame, candCol: String, refCol: String,
                 maxN: Int = 6, beta: Int = 2): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    require(beta >= 1, s"beta must be >= 1, got $beta")
    def stripped(c: Column): Column =
      regexp_replace(coalesce(c, lit("")), "\\s+", "")
    def grams(c: Column, n: Int): Column = TextFunctions.charNgrams(c, n)

    val b2 = beta.toLong * beta.toLong
    val base = pairs
      .withColumn("__cs", stripped(col(candCol)))
      .withColumn("__rs", stripped(col(refCol)))
      .withColumn("len_c", length(col("__cs")).cast("long"))
      .withColumn("len_r", length(col("__rs")).cast("long"))
    val withCounts = (1 to maxN).foldLeft(base) { (df, n) =>
      df.withColumn(s"ov_$n",
          Rouge.clippedOverlap(grams(col("__cs"), n), grams(col("__rs"), n))
            .cast("long"))
        .withColumn(s"nc_$n", greatest(lit(0L), col("len_c") - lit(n - 1L)))
        .withColumn(s"nr_$n", greatest(lit(0L), col("len_r") - lit(n - 1L)))
    }
    // Exact integer floor division for non-negative longs: (a − a mod b)
    // is an exact multiple of b, and IEEE double division of an exact
    // multiple ≤ 2⁵³ by its divisor returns the integer quotient
    // EXACTLY (correctly-rounded division of a representable exact
    // value). Max operand here is (1+β²)·10¹² ≪ 2⁵³.
    def idiv(a: Column, b: Column): Column =
      ((a.cast("long") - pmod(a.cast("long"), b.cast("long"))) /
        b.cast("long")).cast("long")
    def avgPpmCol(side: String): Column = {
      val cntOf = (n: Int) => col(s"n$side" + s"_$n")
      val valid = (1 to maxN).map(n => when(cntOf(n) > 0, 1L).otherwise(0L))
        .reduce(_ + _)
      val sum = (1 to maxN).map(n =>
        when(cntOf(n) > 0, idiv(col(s"ov_$n") * lit(1000000L), cntOf(n)))
          .otherwise(lit(0L))).reduce(_ + _)
      when(valid > 0, idiv(sum, valid).cast("long"))
    }
    withCounts
      .withColumn("avg_p_ppm", avgPpmCol("c"))
      .withColumn("avg_r_ppm", avgPpmCol("r"))
      .withColumn("chrf_ppm",
        when(col("avg_p_ppm").isNull || col("avg_r_ppm").isNull ||
          (col("avg_p_ppm") === 0L && col("avg_r_ppm") === 0L), lit(0L))
          .otherwise(idiv(lit(1L + b2) * col("avg_p_ppm") * col("avg_r_ppm"),
            lit(b2) * col("avg_p_ppm") + col("avg_r_ppm")).cast("long")))
      .drop("__cs", "__rs")
  }

  /** DuckDB replica of [[chrfReport]]: `pairsSql` must yield
    * (doc_id, cand_text, ref_text); output matches the Spark columns
    * keyed by doc_id, ordered by doc_id. Character slicing is
    * codepoint-based in both engines (ASCII-safe by the testdata
    * layout contract; documented boundary for astral-plane input). */
  def chrfOracleSql(pairsSql: String, maxN: Int = 6, beta: Int = 2): String = {
    val b2 = beta.toLong * beta.toLong
    def gramList(src: String, n: Int): String =
      if (n == 1) s"[$src[i:i] for i in range(1, length($src) + 1)]"
      else s"[$src[i:i+${n - 1}] for i in range(1, length($src) - ${n - 2})]"
    val gramCtes = (1 to maxN).map { n =>
      s"""cg$n AS (SELECT doc_id, g, count(*) AS c FROM
         |  (SELECT doc_id, unnest(${gramList("cs", n)}) AS g FROM base) GROUP BY 1, 2),
         |rg$n AS (SELECT doc_id, g, count(*) AS c FROM
         |  (SELECT doc_id, unnest(${gramList("rs", n)}) AS g FROM base) GROUP BY 1, 2),
         |ov$n AS (SELECT cg$n.doc_id,
         |    CAST(sum(least(cg$n.c, rg$n.c)) AS BIGINT) AS ov
         |  FROM cg$n JOIN rg$n ON cg$n.doc_id = rg$n.doc_id AND cg$n.g = rg$n.g
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val countCols = (1 to maxN).map { n =>
      s"""  CAST(COALESCE(o$n.ov, 0) AS BIGINT) AS ov_$n,
         |  CAST(greatest(0, b.len_c - ${n - 1}) AS BIGINT) AS nc_$n,
         |  CAST(greatest(0, b.len_r - ${n - 1}) AS BIGINT) AS nr_$n""".stripMargin
    }.mkString(",\n")
    val ovJoins = (1 to maxN)
      .map(n => s"LEFT JOIN ov$n o$n ON o$n.doc_id = b.doc_id")
      .mkString("\n")
    def avgSql(side: String): String = {
      val valid = (1 to maxN)
        .map(n => s"CASE WHEN n$side$n > 0 THEN 1 ELSE 0 END").mkString(" + ")
      val sum = (1 to maxN)
        .map(n => s"CASE WHEN n$side$n > 0 THEN (ovv$n * 1000000) // n$side$n ELSE 0 END")
        .mkString(" + ")
      s"CASE WHEN ($valid) > 0 THEN CAST(($sum) // ($valid) AS BIGINT) END"
    }
    val repCols = (1 to maxN)
      .map(n => s"ov_$n AS ovv$n, nc_$n AS nc$n, nr_$n AS nr$n").mkString(", ")
    s"""WITH pairs AS ($pairsSql),
       |base AS (SELECT doc_id,
       |    regexp_replace(COALESCE(cand_text, ''), '\\s+', '', 'g') AS cs,
       |    regexp_replace(COALESCE(ref_text, ''), '\\s+', '', 'g') AS rs
       |  FROM pairs),
       |lens AS (SELECT doc_id, cs, rs,
       |    CAST(length(cs) AS BIGINT) AS len_c,
       |    CAST(length(rs) AS BIGINT) AS len_r FROM base),
       |$gramCtes,
       |cnt AS (SELECT b.doc_id, b.len_c, b.len_r,
       |$countCols
       |FROM lens b
       |$ovJoins),
       |rep AS (SELECT doc_id, len_c, len_r, $repCols,
       |  ${avgSql("c")} AS avg_p_ppm,
       |  ${avgSql("r")} AS avg_r_ppm
       |FROM cnt)
       |SELECT doc_id, len_c, len_r,
       |  ${(1 to maxN).map(n => s"ovv$n AS ov_$n, nc$n AS nc_$n, nr$n AS nr_$n").mkString(", ")},
       |  avg_p_ppm, avg_r_ppm,
       |  CAST(CASE WHEN avg_p_ppm IS NULL OR avg_r_ppm IS NULL
       |      OR (avg_p_ppm = 0 AND avg_r_ppm = 0) THEN 0
       |    ELSE (${1 + b2} * avg_p_ppm * avg_r_ppm) //
       |      ($b2 * avg_p_ppm + avg_r_ppm) END AS BIGINT) AS chrf_ppm
       |FROM rep
       |ORDER BY doc_id""".stripMargin
  }
}
