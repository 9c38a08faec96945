package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal calibration (Vovk et al.; Lei et al. 2018) — the
  * distribution-free way to turn ANY point predictor into prediction
  * intervals with finite-sample coverage: on a held-out calibration
  * split, take the ceil((n+1)(1−α))-th smallest nonconformity score
  * |y − ŷ| as q̂; the interval ŷ ± q̂ then covers a fresh point with
  * probability ≥ 1 − α (exchangeability is the only assumption). The
  * eval-pipeline use: audit per-slice q̂ and realized test coverage —
  * a slice whose q̂ explodes has an unreliable predictor.
  *
  * Exact integer discipline: y/ŷ are longs, nonconformity is |y−ŷ|,
  * the q̂ rank is pure integer math ((n+1)·(100−alphaPct) + 99) div
  * 100 — ceil without floats — and when the rank exceeds n_cal (tiny
  * calibration sets) q̂ is conservatively +∞, emitted as NULL with
  * full coverage, the standard finite-sample convention. Coverage is
  * ppm.
  *
  * Scale shape: one row_number window per group over the CALIBRATION
  * rows only (grouped-percentile layout, same contract as
  * [[Quantiles.exactPercentiles]] — group-sized, use coarser slices
  * if a single slice outgrows a partition), then a broadcast-sized
  * (one row per group) q̂ join back onto the test rows.
  *
  * @param df one row per scored example:
  *           (groupCols…, yCol long, yhatCol long, calCol boolean —
  *           true = calibration split, false = test split)
  * @return one row per group: (groupCols…, n_cal, n_test, qhat —
  *         NULL means +∞ — n_covered, coverage_ppm; NULL coverage
  *         for empty test slices). CAL ROWS REQUIRED per group: a
  *         group with ONLY test rows has no calibration quantile to
  *         report and is dropped from the output entirely (the cal
  *         counts drive the result and the test side inner-joins it;
  *         the oracle replays the same convention) — callers auditing
  *         per-slice coverage must treat an absent slice as
  *         "uncalibratable", not as zero.
  */
object Conformal {

  def splitConformal(df: DataFrame, groupCols: Seq[String],
                     yCol: String, yhatCol: String, calCol: String,
                     alphaPct: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(alphaPct >= 1 && alphaPct <= 50,
      s"alphaPct must be in [1, 50], got $alphaPct")
    val g = groupCols.map(col)
    val scored = df
      .filter(col(yCol).isNotNull && col(yhatCol).isNotNull &&
        col(calCol).isNotNull)
      .select(g ++ Seq(col(calCol).as("__cal"),
        abs(col(yCol).cast("long") - col(yhatCol).cast("long"))
          .as("__nc")): _*)
      .transform(Materialize.once) // cal ranking + test coverage read it
    val cal = scored.filter(col("__cal"))
    val w = Window.partitionBy(g: _*).orderBy(col("__nc"))
    val ranked = cal
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g: _*)))
    val keep = 100 - alphaPct
    val qhat = ranked
      .filter(col("__rn") === expr(s"((__n + 1) * $keep + 99) div 100"))
      .select(g ++ Seq(col("__n").as("n_cal"), col("__nc").as("qhat")): _*)
    // rank > n_cal (tiny slice) → no row above: recover the group from
    // the cal counts and emit qhat NULL (= +∞, conservative)
    val calCounts = cal.groupBy(g: _*).agg(count(lit(1)).as("n_cal"))
    val qhatAll = calCounts.join(qhat.drop("n_cal"), groupCols, "left")
    val test = scored.filter(!col("__cal"))
      .join(broadcast(qhatAll), groupCols, "inner")
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("qhat").isNull || col("__nc") <= col("qhat"), 1L)
          .otherwise(0L)).as("n_covered"))
    qhatAll.join(test, groupCols, "left")
      .select(g ++ Seq(col("n_cal"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        col("qhat"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        when(coalesce(col("n_test"), lit(0L)) === 0L,
          lit(null).cast("long"))
          .otherwise(expr("(n_covered * 1000000) div n_test"))
          .as("coverage_ppm")): _*)
  }

  /** DuckDB replay of [[splitConformal]]: identical rank arithmetic
    * and NULL-as-infinity convention. `srcSql` yields
    * (groupCols…, y BIGINT, yhat BIGINT, cal BOOLEAN). */
  def splitConformalOracleSql(srcSql: String, groupCols: Seq[String],
                              alphaPct: Int): String = {
    val gl = groupCols.mkString(", ")
    val keep = 100 - alphaPct
    s"""WITH s AS (SELECT $gl, cal,
       |    abs(CAST(y AS BIGINT) - CAST(yhat AS BIGINT)) AS nc
       |  FROM ($srcSql)
       |  WHERE y IS NOT NULL AND yhat IS NOT NULL AND cal IS NOT NULL),
       |cal AS (SELECT $gl, nc,
       |    row_number() OVER (PARTITION BY $gl ORDER BY nc) AS rn,
       |    count(*) OVER (PARTITION BY $gl) AS n
       |  FROM s WHERE cal),
       |q AS (SELECT $gl, nc AS qhat FROM cal
       |  WHERE rn = ((n + 1) * $keep + 99) // 100),
       |cc AS (SELECT $gl, CAST(count(*) AS BIGINT) AS n_cal
       |  FROM s WHERE cal GROUP BY $gl),
       |qa AS (SELECT cc.*, qhat FROM cc LEFT JOIN q USING ($gl)),
       |t AS (SELECT $gl, CAST(count(*) AS BIGINT) AS n_test,
       |    CAST(sum(CASE WHEN qhat IS NULL OR nc <= qhat
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
       |  FROM s JOIN qa USING ($gl) WHERE NOT cal GROUP BY $gl)
       |SELECT $gl, n_cal,
       |  coalesce(n_test, 0) AS n_test, qhat,
       |  coalesce(n_covered, 0) AS n_covered,
       |  CASE WHEN coalesce(n_test, 0) = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE n_covered * 1000000 // n_test END AS coverage_ppm
       |FROM qa LEFT JOIN t USING ($gl)
       |ORDER BY $gl""".stripMargin
  }
}
