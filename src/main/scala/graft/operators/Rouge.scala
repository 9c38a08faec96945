package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** ROUGE-N overlap metrics (Lin 2004) over candidate/reference text
  * pairs — the summarization / generation eval yardstick, and in a
  * curation pipeline the scorer for reference-anchored filtering
  * (keep a rewrite only if it retains ≥ r recall of its source's
  * n-grams).
  *
  * Definitions (multiset / "clipped" counting, the standard):
  *   overlap_n  = Σ_g min(count_cand(g), count_ref(g))
  *   precision  = overlap_n / |cand n-grams|
  *   recall     = overlap_n / |ref  n-grams|
  * Counts are exact integers; precision/recall are each ONE IEEE-754
  * division of those integers, so any engine reproduces the same bits
  * (the q56 dup_ratio discipline — no multi-step float pipelines).
  *
  * 100 TB shape: the whole metric is a compiled per-row projection —
  * tokenize, shingle, and the clipped multiset intersection inside
  * ONE higher-order-function expression. Zero shuffle, zero explode,
  * zero UDF: a corpus-sized eval run is a single map stage whose cost
  * is O(d · (g_a + g_b)) per pair (d = distinct candidate grams), and
  * whatever join produced the (cand, ref) pairs upstream remains the
  * only exchange.
  */
object Rouge {

  /** Clipped n-gram overlap: Σ_g min(count_a(g), count_b(g)), as a
    * compiled column over two gram-array columns — fold the DISTINCT
    * grams of `a`, adding each gram's clipped count (grams only in
    * `b` contribute min(0, ·) = 0 and need no pass). */
  private[operators] def clippedOverlap(a: Column, b: Column): Column =
    aggregate(
      array_distinct(a),
      lit(0),
      (acc, g) => acc +
        least(size(filter(a, x => x === g)), size(filter(b, x => x === g))))

  /** Per-pair ROUGE-N report. Input: one row per (candidate,
    * reference) text pair; output adds exact integer counts
    * `overlap_n`, `cand_grams`, `ref_grams` and single-division
    * `precision_n` / `recall_n` doubles (NULL when the respective
    * denominator is zero — an empty side has no defined score).
    * NULL text is defined as ZERO grams (same as blank): without the
    * guard a NULL side would poison the fold with SQL `least`'s
    * null-skipping (least(c, NULL) = c), silently scoring overlap =
    * the candidate's full gram count. */
  def rougeN(pairs: DataFrame, candCol: String, refCol: String,
             n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    def grams(c: Column): Column = coalesce(
      if (n == 1) TextFunctions.tokens(c)
      else TextFunctions.wordShingles(c, n),
      array().cast("array<string>"))
    val cg = grams(col(candCol))
    val rg = grams(col(refCol))
    pairs
      .withColumn("overlap_n", clippedOverlap(cg, rg).cast("long"))
      .withColumn("cand_grams", size(cg).cast("long"))
      .withColumn("ref_grams", size(rg).cast("long"))
      .withColumn("precision_n",
        when(col("cand_grams") > 0,
          col("overlap_n").cast("double") / col("cand_grams")))
      .withColumn("recall_n",
        when(col("ref_grams") > 0,
          col("overlap_n").cast("double") / col("ref_grams")))
  }
}
