package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the nonparametric time-to-event
  * curve (Kaplan & Meier, JASA 1958) behind churn/retention dashboards
  * and any "how long until X" product question where observation
  * windows end before every subject converts (right-censoring). Naive
  * conversion-rate-by-day silently treats censored subjects as
  * never-converting; KM removes them from the risk set instead.
  *
  * Estimator: at each distinct event time t with d_t events out of
  * n_t subjects still at risk (duration ≥ t; censored subjects leave
  * the risk set after their censor time but count in n_t at it),
  * S(t) multiplies by (1 − d_t/n_t).
  *
  * Determinism: the survival product is the quantize-then-multiply
  * integer recurrence `s_i = (s_{i-1} · (n_i − d_i)) div n_i` starting
  * at 10⁶ — every operand nonnegative, so Spark's truncating `div` and
  * DuckDB's flooring `//` agree, and [[kaplanMeierOracleSql]] replays
  * it step for step.
  *
  * Scale shape: one duration-keyed map-side-combined aggregate
  * collapses N subjects to the duration histogram (calendar-bounded —
  * days in the observation window, hundreds of rows, the same
  * control-plane contract as TimeOps.acf); risk-set sizes and the
  * sequential product then run as one collect + array fold on that
  * histogram, never on subjects. No window touches the subject table.
  */
object Survival {

  /** KM curve over subjects (durCol: long duration, e.g. days;
    * observedCol: 1 = event occurred at durCol, 0 = censored there).
    *
    * @return one row per distinct EVENT time (d > 0), t-ascending:
    *         (t, n_risk, n_event, n_censored_at_t, surv_ppm)
    */
  def kaplanMeier(df: DataFrame, durCol: String, observedCol: String): DataFrame = {
    val hist = df
      .filter(col(durCol).isNotNull && col(durCol) >= 0)
      .groupBy(col(durCol).cast("long").as("t"))
      .agg(sum(col(observedCol).cast("long")).as("d"),
        sum(lit(1L) - col(observedCol).cast("long")).as("c"))
    // fold ascending over the duration histogram: risk set starts at
    // the subject total and sheds (d + c) after each time step
    val fold = """
      aggregate(__h,
        struct(CAST(__n AS BIGINT) AS atrisk, CAST(1000000 AS BIGINT) AS s,
               CAST(array() AS array<struct<t: BIGINT, n_risk: BIGINT,
                 n_event: BIGINT, n_cens: BIGINT, surv_ppm: BIGINT>>) AS out),
        (acc, p) -> struct(
          acc.atrisk - p.d - p.c AS atrisk,
          CASE WHEN p.d > 0 THEN (acc.s * (acc.atrisk - p.d)) div acc.atrisk
               ELSE acc.s END AS s,
          CASE WHEN p.d > 0 THEN concat(acc.out, array(struct(
              p.t AS t, acc.atrisk AS n_risk, p.d AS n_event, p.c AS n_cens,
              ((acc.s * (acc.atrisk - p.d)) div acc.atrisk) AS surv_ppm)))
            ELSE acc.out END AS out))"""
    hist.agg(sum(col("d") + col("c")).as("__n"),
        sort_array(collect_list(struct(col("t"), col("d"), col("c")))).as("__h"))
      .select(explode(expr(fold).getField("out")).as("__e"))
      .select(col("__e.t").as("t"), col("__e.n_risk").as("n_risk"),
        col("__e.n_event").as("n_event"), col("__e.n_cens").as("n_cens"),
        col("__e.surv_ppm").as("surv_ppm"))
      .orderBy("t")
  }

  /** DuckDB replay of [[kaplanMeier]] over `subjectsSql` projecting
    * (dur, observed). Recursive CTE walks the duration histogram in
    * t-order carrying (atrisk, s) exactly as the fold does. */
  def kaplanMeierOracleSql(subjectsSql: String): String =
    s"""WITH RECURSIVE subjects AS ($subjectsSql),
       |hist AS (
       |  SELECT CAST(dur AS BIGINT) AS t,
       |         CAST(sum(observed) AS BIGINT) AS d,
       |         CAST(sum(1 - observed) AS BIGINT) AS c,
       |         row_number() OVER (ORDER BY CAST(dur AS BIGINT)) AS i
       |  FROM subjects WHERE dur IS NOT NULL AND dur >= 0 GROUP BY 1),
       |walk(i, t, d, c, atrisk, s) AS (
       |  SELECT h.i, h.t, h.d, h.c,
       |         (SELECT sum(d + c) FROM hist), CAST(1000000 AS BIGINT)
       |  FROM hist h WHERE h.i = 1
       |  UNION ALL
       |  SELECT h.i, h.t, h.d, h.c,
       |         w.atrisk - w.d - w.c,
       |         CASE WHEN w.d > 0 THEN (w.s * (w.atrisk - w.d)) // w.atrisk
       |              ELSE w.s END
       |  FROM walk w JOIN hist h ON h.i = w.i + 1)
       |SELECT t, CAST(atrisk AS BIGINT) AS n_risk, d AS n_event, c AS n_cens,
       |       CAST((s * (atrisk - d)) // atrisk AS BIGINT) AS surv_ppm
       |FROM walk WHERE d > 0 ORDER BY t""".stripMargin
}
