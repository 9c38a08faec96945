package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimation — the median of all pairwise
  * slopes of a time series, the breakdown-resistant alternative to
  * least squares (up to ~29% of the points can be arbitrarily corrupt
  * before the estimate moves). The trend screen a data-quality pass
  * runs over per-day corpus metrics where one bad ingest day would
  * wreck an OLS fit.
  *
  * Determinism: slopes are floor-quantized micro-units per time step
  * via the engine-portable floor identity
  * `floor(a/b) = (a − ((a mod b) + b) mod b) div b` (b > 0; the
  * subtraction makes the division exact, so truncating and flooring
  * engines agree), and the median is the type-1 rank statistic
  * `max(1, ceil(n/2))` — [[Quantiles.exactGlobalPercentiles]]'s exact
  * selection, no global sort. The intercept is the median residual at
  * `t − min(t)` (centering keeps `slope·span` inside the exact-double
  * window the selector operates in; both centerings are replayed by
  * the oracle).
  *
  * Scale shape: the pair frame is a broadcast self-join (one side
  * broadcast, NO shuffle) — m(m−1)/2 slope rows for an m-point
  * series. m is a SERIES length (days/hours of a metric), not a
  * corpus size: the require caps it at 20 000 points (≤ 2·10⁸ pairs,
  * distributed across the cluster); aggregate wider inputs to a
  * coarser grain upstream. Median selection is the iterative
  * histogram refinement of exactGlobalPercentiles — O(scans), never
  * a single-partition sort.
  *
  * Magnitude contract: slopes and residuals must stay inside the
  * selector's exact-double window (|x| < 2⁵³). Enforced on the
  * ACTUAL data (one cheap agg per frame), not a worst-case bound —
  * re-unit the value column (cents → dollars) when it trips.
  */
object RobustTrend {

  private val Micro = 1000000L
  private val MaxPoints = 20000L
  private val ExactDouble = 4500000000000000L // < 2^53, headroom ×2

  /** Floor division `a div b` for b > 0 with possibly-negative `a`,
    * spelled so Spark (truncating) and DuckDB (flooring) compute the
    * identical integer. */
  private def floorDivSql(a: String, b: String): String =
    s"($a - ((($a) % ($b)) + ($b)) % ($b)) div ($b)"

  /** @param series one row per time point: (tCol ascending-comparable
    *               long, vCol long); t must be unique (pre-aggregate
    *               duplicates — a vertical pair has no slope)
    * @return one row: (n_points, n_pairs, slope_micro — micro-units
    *         of v per unit of t — and intercept_micro, the median
    *         `v·10⁶ − slope·(t − min t)`)
    */
  def theilSen(series: DataFrame, tCol: String, vCol: String): DataFrame = {
    val spark = series.sparkSession
    val pts = Materialize.once(series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v")))
    val st = pts.agg(count(lit(1)), countDistinct(col("t")), min(col("t")),
      max(abs(col("v"))), max(col("t"))).head()
    val m = st.getLong(0)
    require(m >= 2, s"theilSen: need at least 2 points, got $m")
    require(st.getLong(1) == m,
      "theilSen: duplicate t values — aggregate the series to one row " +
        "per time point upstream (a vertical pair has no slope)")
    require(m <= MaxPoints,
      s"theilSen: $m points breaks the m <= $MaxPoints contract " +
        "(pairs grow as m²); aggregate to a coarser time grain")
    // overflow guards BEFORE any product is formed: the post-division
    // window checks below can't catch a Long that already wrapped in
    // `(b.v - a.v) * Micro` or `v * Micro`, so bound the operands up
    // front — |Δv| ≤ 2·max|v| must survive the ×10⁶
    val maxAbsV = st.getLong(3)
    require(maxAbsV <= Long.MaxValue / Micro / 2,
      s"theilSen: max |v| $maxAbsV would overflow (v_b - v_a) * 1e6 " +
        "before the exact-window check; re-unit the value column")
    val tMin = st.getLong(2)
    val tMax = st.getLong(4)
    val slopes = pts.as("a")
      .join(broadcast(pts.as("b")), col("a.t") < col("b.t"))
      .select(expr(floorDivSql(s"(b.v - a.v) * $Micro", "b.t - a.t"))
        .as("slope"))
      .transform(Materialize.once) // bound check + selector share it
    val maxSlope = slopes.agg(max(abs(col("slope")))).head().getLong(0)
    require(maxSlope <= ExactDouble,
      s"theilSen: max |slope| $maxSlope exceeds the exact-double " +
        "selection window; re-unit the value column")
    val slopeMed = Quantiles.exactGlobalPercentiles(slopes, "slope", Seq(50))
      .head().getDouble(1).toLong
    // exact driver-side check that the residual products can't wrap:
    // |v·10⁶| + |slope·(t − tmin)| must fit a Long BEFORE computing
    // the residual frame (its own max-check is post-hoc)
    require((BigInt(maxAbsV) * Micro +
        BigInt(slopeMed).abs * BigInt(tMax - tMin)) < BigInt(Long.MaxValue),
      s"theilSen: residual arithmetic |v|*1e6 + |slope|*(t_range) " +
        s"overflows Long (max|v|=$maxAbsV, slope=$slopeMed, " +
        s"t range=${tMax - tMin}); re-unit the inputs")
    val resid = pts
      .select((col("v") * Micro - lit(slopeMed) * (col("t") - tMin)).as("r"))
      .transform(Materialize.once)
    val maxResid = resid.agg(max(abs(col("r")))).head().getLong(0)
    require(maxResid <= ExactDouble,
      s"theilSen: max |residual| $maxResid exceeds the exact-double " +
        "selection window; re-unit the value column")
    val interceptMed = Quantiles.exactGlobalPercentiles(resid, "r", Seq(50))
      .head().getDouble(1).toLong
    import spark.implicits._
    Seq((m, m * (m - 1) / 2, slopeMed, interceptMed))
      .toDF("n_points", "n_pairs", "slope_micro", "intercept_micro")
  }

  /** DuckDB replay of [[theilSen]]: the same pair construction, floor
    * identity, type-1 median ranks and t-centering. `relSql` yields
    * (t, v) BIGINT-castable rows with distinct t. */
  def theilSenOracleSql(relSql: String): String = {
    def fd(a: String, b: String) =
      s"($a - ((($a) % ($b)) + ($b)) % ($b)) // ($b)"
    s"""WITH src AS (SELECT CAST(t AS BIGINT) AS t, CAST(v AS BIGINT) AS v
       |  FROM ($relSql) WHERE t IS NOT NULL AND v IS NOT NULL),
       |p AS (SELECT ${fd(s"(b.v - a.v) * $Micro", "b.t - a.t")} AS slope
       |  FROM src a JOIN src b ON a.t < b.t),
       |sr AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
       |    count(*) OVER () AS np FROM p),
       |med AS (SELECT slope, np FROM sr
       |  WHERE rn = greatest(1, (np * 50 + 99) // 100)),
       |r AS (SELECT v * $Micro - (SELECT slope FROM med)
       |      * (t - (SELECT min(t) FROM src)) AS r FROM src),
       |rr AS (SELECT r, row_number() OVER (ORDER BY r) AS rn,
       |    count(*) OVER () AS nr FROM r)
       |SELECT (SELECT count(*) FROM src) AS n_points,
       |  (SELECT np FROM med) AS n_pairs,
       |  (SELECT slope FROM med) AS slope_micro,
       |  r AS intercept_micro
       |FROM rr WHERE rn = greatest(1, (nr * 50 + 99) // 100)""".stripMargin
  }
}
