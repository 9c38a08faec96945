package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calibration audit of a scored binary signal — reliability-diagram
  * bins plus Expected Calibration Error, the standard "can I trust
  * this model's confidence as a probability" check run before a
  * classifier's scores gate a data pipeline (quality filters, toxicity
  * screens, NB routing: a miscalibrated 0.9 means the threshold keeps
  * junk or drops good data at a rate nobody chose).
  *
  * Exact integer arithmetic end-to-end: confidences arrive in ppm
  * (0..10⁶); bin b = min(conf·nBins div 10⁶, nBins−1) (fixed-width
  * bins, top edge closed). Per bin the reliability gap
  * |mean conf − positive rate| has the exact integer form
  * |Σconf − 10⁶·pos| / cnt, and ECE — the count-weighted gap average —
  * telescopes to  ECE_ppm = (Σ_b |Σconf_b − 10⁶·pos_b|) div N:
  * no per-bin division, no rounding accumulation, bit-identical in
  * any engine.
  *
  * 100 TB shape: ONE map-side-combined aggregate to nBins rows, then
  * bin-sized arithmetic and a broadcast 1-row total — nothing after
  * the first aggregate is data-sized.
  *
  * @param df         rows with a ppm confidence and a 0/1 outcome
  * @param confPpmCol integer confidence in [0, 10⁶]
  * @param outcomeCol 1 = positive, 0 = negative
  * @return one row per non-empty bin: (bin, n, avg_conf_ppm,
  *         pos_rate_ppm, gap_ppm, ece_ppm) — ece_ppm constant across
  *         rows (the corpus-level verdict riding along), ordered by bin
  */
object Calibration {

  def eceBins(df: DataFrame, confPpmCol: String, outcomeCol: String,
              nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "need nBins >= 1")
    val bins = df
      .select(col(confPpmCol).cast("long").as("__c"),
        col(outcomeCol).cast("long").as("__y"))
      .where(col("__c").isNotNull && col("__y").isNotNull)
      .withColumn("bin", least(expr(s"(__c * $nBins) div 1000000"), lit(nBins - 1L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("__sc"),
        sum(col("__y")).as("__pos"))
      .withColumn("__gapAbs", abs(expr("__sc - 1000000 * __pos")))
    val total = bins.agg(sum(col("n")).as("__N"),
      sum(col("__gapAbs")).as("__G"))
    bins.crossJoin(broadcast(total))
      .select(col("bin"), col("n"),
        expr("__sc div n").as("avg_conf_ppm"),
        expr("(1000000 * __pos) div n").as("pos_rate_ppm"),
        expr("__gapAbs div n").as("gap_ppm"),
        expr("__G div __N").as("ece_ppm"))
      .orderBy("bin")
  }

  /** DuckDB replay of [[eceBins]] over `relSql` rows
    * (conf_ppm, outcome). */
  def eceOracleSql(relSql: String, nBins: Int = 10): String =
    s"""WITH r AS MATERIALIZED (
       |  SELECT CAST(conf_ppm AS BIGINT) AS c, CAST(outcome AS BIGINT) AS y
       |  FROM ($relSql) WHERE conf_ppm IS NOT NULL AND outcome IS NOT NULL),
       |b AS MATERIALIZED (
       |  SELECT least((c * $nBins) // 1000000, $nBins - 1) AS bin,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(c) AS BIGINT) AS sc, CAST(sum(y) AS BIGINT) AS pos
       |  FROM r GROUP BY 1),
       |g AS (SELECT bin, n, sc, pos, abs(sc - 1000000 * pos) AS gapabs FROM b),
       |t AS (SELECT sum(n) AS tot_n, sum(gapabs) AS tot_gap FROM g)
       |SELECT bin, n, sc // n AS avg_conf_ppm,
       |       (1000000 * pos) // n AS pos_rate_ppm,
       |       gapabs // n AS gap_ppm,
       |       CAST(tot_gap // tot_n AS BIGINT) AS ece_ppm
       |FROM g, t ORDER BY bin""".stripMargin
}
