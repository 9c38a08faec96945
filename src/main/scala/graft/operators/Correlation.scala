package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact pairwise correlation screen over long-valued columns — the
  * "which measures move together" matrix a feature-engineering pass
  * runs before building models. Pearson r needs a square root, which
  * no two engines floor identically — so this reports the SIGNED
  * SQUARED correlation r²·sign(cov) in ppm plus the raw integer
  * cross-moments, all exact rational arithmetic quantized once:
  * r²_ppm = 10⁶·cov² div (varx·vary), every operand an integer
  * (n-scaled central moments: n·Σxy − Σx·Σy etc.), DECIMAL(38)
  * against a HUGEINT oracle.
  *
  * Scale shape: ONE map-side-combined aggregate over the fact table
  * computes every pair's raw moments simultaneously (Σx, Σx², Σxy per
  * pair) — one scan, one shuffle of a single tiny row, no per-pair
  * passes. Pairs are declared, not discovered: the column list is
  * control-plane sized.
  *
  * Magnitude contract: |x| < 10¹², n < 10¹² keeps n·Σxy < 10³⁶ inside
  * DECIMAL(38); the driver-side require enforces it loudly (the
  * sigmaOutliers pattern) rather than letting Spark emit silent
  * NULLs.
  */
object Correlation {

  /** All unordered pairs of `cols` with exact moment statistics.
    *
    * @return one row per pair (col_a < col_b by list order):
    *         (col_a, col_b, n, cov_n2, varx_n2, vary_n2, r2_ppm) where
    *         cov_n2 = n·Σxy − Σx·Σy (the n²-scaled covariance) and
    *         r2_ppm = sign(cov)·10⁶·cov² div (varx_n2·vary_n2);
    *         NULL r2_ppm when either variance is zero
    */
  def screen(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, s"need at least 2 columns, got ${cols.length}")
    require(cols.distinct == cols, "duplicate columns in screen list")
    // one pass: complete rows only (listwise deletion, like every
    // correlation matrix), so all pairs share one n
    val clean = df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast("long").as(c)): _*)
    val maxRow = clean.agg(
      count(lit(1)).as("n"),
      greatest(cols.map(c => max(abs(col(c)))): _*).as("mx")).head()
    val n = maxRow.getLong(0)
    val mx = if (maxRow.isNullAt(1)) 0L else maxRow.getLong(1)
    require(n < 1000000000000L,
      s"screen: n=$n breaks the n < 10^12 magnitude contract")
    require(mx < 1000000000000L,
      s"screen: max |value| $mx breaks the |x| < 10^12 magnitude contract")
    // the emitted n²-scaled moments are BIGINT: |cov_n2| ≤ (n·mx)², so
    // n·mx must stay under 3·10⁹ — fail loudly instead of overflowing
    // at the output cast. The ppm score is invariant under column
    // scaling, so re-unit oversized measures (cents → $k) upstream.
    require(mx == 0L || n <= 3000000000L / mx,
      s"screen: n·max|x| = ${BigInt(n) * mx} breaks the 3·10^9 output " +
        "contract (n²-scaled moments must fit BIGINT); rescale the measure")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      cols.flatMap(c => Seq(
        sum(col(c).cast("decimal(38,0)")).as(s"__s_$c"),
        sum((col(c) * col(c)).cast("decimal(38,0)")).as(s"__q_$c"))) ++
      pairs.map { case (a, b) =>
        sum((col(a) * col(b)).cast("decimal(38,0)")).as(s"__p_${a}_$b") }
    val m = clean.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").as("n"),
        (col("__n") * col(s"__p_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
          .as("__cov"),
        (col("__n") * col(s"__q_$a") - col(s"__s_$a") * col(s"__s_$a"))
          .as("__vx"),
        (col("__n") * col(s"__q_$b") - col(s"__s_$b") * col(s"__s_$b"))
          .as("__vy"))
    }.reduce(_.unionByName(_))
    rows.select(col("col_a"), col("col_b"), col("n"),
      col("__cov").cast("long").as("cov_n2"),
      col("__vx").cast("long").as("varx_n2"),
      col("__vy").cast("long").as("vary_n2"),
      when(col("__vx") === 0 || col("__vy") === 0, lit(null).cast("long"))
        .otherwise(
          signum(col("__cov")).cast("decimal(38,0)") *
          expr("""CAST((__cov * __cov * 1000000)
                 |  div (__vx * __vy) AS DECIMAL(38,0))""".stripMargin))
        .cast("long").as("r2_ppm"))
  }

  /** DuckDB replay of [[screen]] over `relSql` projecting the listed
    * BIGINT columns. Generated per pair from the same list so the
    * two sides can never disagree on pair order or naming. */
  def screenOracleSql(relSql: String, cols: Seq[String]): String = {
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val pairSelects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_n2,
         |  CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS varx_n2,
         |  CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS vary_n2,
         |  CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) = 0
         |         OR count(*) * sum(y * y) - sum(y) * sum(y) = 0 THEN NULL
         |    ELSE CAST(CASE WHEN count(*) * sum(x * y) - sum(x) * sum(y) < 0
         |                THEN -1 ELSE 1 END
         |      * (((count(*) * sum(x * y) - sum(x) * sum(y))
         |          * (count(*) * sum(x * y) - sum(x) * sum(y)) * 1000000)
         |         // ((count(*) * sum(x * x) - sum(x) * sum(x))
         |            * (count(*) * sum(y * y) - sum(y) * sum(y)))) AS BIGINT)
         |    END AS r2_ppm
         |FROM moments_src
         |CROSS JOIN (SELECT 1) one
         |""".stripMargin.trim.replace("x * y", s"CAST($a AS HUGEINT) * $b")
        .replace("x * x", s"CAST($a AS HUGEINT) * $a")
        .replace("y * y", s"CAST($b AS HUGEINT) * $b")
        .replace("sum(x)", s"sum(CAST($a AS HUGEINT))")
        .replace("sum(y)", s"sum(CAST($b AS HUGEINT))")
    }
    s"""WITH moments_src AS (
       |  SELECT ${cols.map(c => s"CAST($c AS BIGINT) AS $c").mkString(", ")}
       |  FROM ($relSql) WHERE $notNull)
       |SELECT * FROM (${pairSelects.mkString("\nUNION ALL\n")})
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** Kendall τ-b rank agreement per group — the tie-corrected
    * concordance test between two per-row measures (do two quality
    * scorers ORDER the corpus the same way?), robust where Pearson is
    * hostage to outliers and nonlinearity. Exact integer counts over
    * the standard quantities:
    *   C, D          concordant / discordant pairs
    *   T_x, T_y      pairs tied in x (resp. y), both-tied included
    *   T_xy          pairs tied in both
    *   τ-b           (C−D)/√((N0−T_x)(N0−T_y)),  N0 = n(n−1)/2
    * Following [[screen]]'s no-sqrt discipline the emitted score is
    * the SIGNED SQUARED τ in ppm — sign(C−D)·10⁶·(C−D)² div
    * ((N0−T_x)(N0−T_y)) — every operand an exact integer in
    * DECIMAL(38,0); NULL when a side is constant (denominator 0).
    *
    * Scale shape: rows collapse to the (x, y) VALUE-CELL grid first
    * (one hash-agg, map-side combined), and every pair statistic is a
    * conditional sum over ordered CELL pairs — work is Σ_group m²
    * for m distinct value cells, never n². Like
    * [[RankTests.mannWhitney]], band/quantize continuous measures
    * first to keep m grid-sized; the magnitude contract (n < 10¹² per
    * group) keeps (C−D)² inside DECIMAL(38).
    *
    * @return (groupCols…, n, concordant, discordant, t_x, t_y, t_xy,
    *         tau2_ppm) — one row per group
    */
  def kendallTau(df: DataFrame, groupCols: Seq[String],
                 xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(g :+ col(xCol).cast("long").as("__x")
        :+ col(yCol).cast("long").as("__y"): _*)
      .agg(count(lit(1)).cast(dec).as("__c"))
      .transform(Materialize.once) // both sides of the cell join + the
                                   // within-cell fold read this
    val a = cells.select(g ++ Seq(col("__x").as("__xa"),
      col("__y").as("__ya"), col("__c").as("__ca")): _*)
    val b = cells.select(g ++ Seq(col("__x").as("__xb"),
      col("__y").as("__yb"), col("__c").as("__cb")): _*)
    // every unordered cell pair once: lexicographic (x, y) order
    val lexLess = col("__xa") < col("__xb") ||
      (col("__xa") === col("__xb") && col("__ya") < col("__yb"))
    val zero = lit(0).cast(dec)
    val cross = a.join(b, groupCols).filter(lexLess)
      .groupBy(g: _*)
      .agg(
        sum(when(col("__xa") < col("__xb") && col("__ya") < col("__yb"),
          col("__ca") * col("__cb")).otherwise(zero)).as("__cc"),
        sum(when(col("__xa") < col("__xb") && col("__ya") > col("__yb"),
          col("__ca") * col("__cb")).otherwise(zero)).as("__dd"),
        sum(when(col("__xa") === col("__xb"),
          col("__ca") * col("__cb")).otherwise(zero)).as("__txc"),
        sum(when(col("__xa") < col("__xb") && col("__ya") === col("__yb"),
          col("__ca") * col("__cb")).otherwise(zero)).as("__tyc"))
    val within = cells.groupBy(g: _*)
      .agg(sum(col("__c")).as("__n"),
        sum(expr("(__c * (__c - 1)) div 2")).as("__txy"))
    within.join(cross, groupCols, "left")
      .select(g ++ Seq(
        col("__n").cast("long").as("n"),
        coalesce(col("__cc"), zero).cast("long").as("concordant"),
        coalesce(col("__dd"), zero).cast("long").as("discordant"),
        (coalesce(col("__txc"), zero) + col("__txy")).cast("long").as("t_x"),
        (coalesce(col("__tyc"), zero) + col("__txy")).cast("long").as("t_y"),
        col("__txy").cast("long").as("t_xy"),
        expr(s"""CASE WHEN ((__n * (__n - 1)) div 2 - (coalesce(__txc, 0) + __txy)) <= 0
                 |  OR ((__n * (__n - 1)) div 2 - (coalesce(__tyc, 0) + __txy)) <= 0
                 |THEN CAST(NULL AS BIGINT)
                 |ELSE CAST((CASE WHEN coalesce(__cc, 0) < coalesce(__dd, 0)
                 |             THEN -1 ELSE 1 END
                 |  * (((coalesce(__cc, 0) - coalesce(__dd, 0))
                 |      * (coalesce(__cc, 0) - coalesce(__dd, 0)) * 1000000)
                 |     div (((__n * (__n - 1)) div 2 - (coalesce(__txc, 0) + __txy))
                 |          * ((__n * (__n - 1)) div 2 - (coalesce(__tyc, 0) + __txy)))))
                 |  AS BIGINT) END""".stripMargin).as("tau2_ppm")): _*)
  }

  private val MilliRank = 1000L

  /** Spearman ρ per group — rank correlation with tie midranks, the
    * monotone-association screen that survives outliers and nonlinear
    * but order-preserving transforms. Ranks are DOUBLED midranks
    * (2·|{x' < x}| + |{x' = x}| + 1 — integers even under ties), then
    * quantized to MILLIRANKS `(r2·500) div n` ∈ [0, 1000] (the
    * lowest doubled midranks floor-quantize to 0 once n > 1000) so every
    * downstream moment stays inside the [[screen]] magnitude contract
    * whatever the group size; ρ on milliranks equals ρ on ranks up to
    * the documented 10⁻³ rank quantization (both engines compute the
    * identical integers, so the oracle hash-matches exactly).
    *
    * No-sqrt discipline: emits the signed squared ρ in ppm via the
    * staged division `((cov² div varx)·10⁶) div vary` — staging keeps
    * the intermediate ≤ 10⁶·vary instead of cov²·10⁶ (which can
    * overflow DECIMAL(38) at large n). NULL when either side is
    * constant.
    *
    * Scale shape: rows collapse to (x, y) VALUE CELLS (one map-side
    * combined agg); milliranks come from cumulative sums over the
    * per-group x- (resp. y-) MARGINALS — windows over distinct-value
    * marginals, m rows per group, never row-sized; band/quantize
    * continuous measures upstream to keep m grid-sized (the
    * [[kendallTau]] contract). Two broadcast-sized joins put the
    * milliranks back on the cells; one final agg per group.
    *
    * @return (groupCols…, n, cov_n2, varx_n2, vary_n2, rho2_ppm)
    */
  def spearman(df: DataFrame, groupCols: Seq[String],
               xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(g :+ col(xCol).cast("long").as("__x")
        :+ col(yCol).cast("long").as("__y"): _*)
      .agg(count(lit(1)).as("__c"))
      .transform(Materialize.once) // marginals ×2 + the final join read it
    // per-group totals; n ≤ 3·10⁹ keeps n·Σ(c·px·py) ≤ n²·10⁶ < 10²⁵
    // in DECIMAL(38) and the emitted n²-scaled moments inside BIGINT
    // only when n·millirank ≤ 3·10⁹ — enforce loudly like screen does
    val totals = cells.groupBy(g: _*).agg(sum(col("__c")).as("__n"))
    val maxNRow = totals.agg(max(col("__n"))).head()
    val maxN = if (maxNRow.isNullAt(0)) 0L else maxNRow.getLong(0)
    require(maxN <= 3000000L,
      s"spearman: largest group n=$maxN breaks the n ≤ 3·10^6 contract " +
        "(n·millirank must keep n²-scaled moments inside BIGINT); " +
        "pre-aggregate or sample the group upstream")
    def milliranks(vc: String, out: String): DataFrame = {
      val marginal = cells.groupBy(g :+ col(vc): _*)
        .agg(sum(col("__c")).as("__cv"))
      val w = Window.partitionBy(g: _*).orderBy(col(vc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marginal
        .withColumn("__cum", sum(col("__cv")).over(w))
        .join(totals, groupCols)
        // doubled midrank 2·less + cv + 1 = 2·cum − cv + 1, milli-quantized
        .select(g ++ Seq(col(vc),
          expr(s"((2 * __cum - __cv + 1) * ${MilliRank / 2}) div __n")
            .as(out)): _*)
    }
    val withRanks = cells
      .join(milliranks("__x", "__px"), groupCols :+ "__x")
      .join(milliranks("__y", "__py"), groupCols :+ "__y")
    val m = withRanks.groupBy(g: _*).agg(
      sum(col("__c")).cast(dec).as("__n"),
      sum((col("__c") * col("__px")).cast(dec)).as("__sx"),
      sum((col("__c") * col("__py")).cast(dec)).as("__sy"),
      sum((col("__c") * col("__px") * col("__px")).cast(dec)).as("__qx"),
      sum((col("__c") * col("__py") * col("__py")).cast(dec)).as("__qy"),
      sum((col("__c") * col("__px") * col("__py")).cast(dec)).as("__pxy"))
    m.select(g ++ Seq(
      col("__n").cast("long").as("n"),
      (col("__n") * col("__pxy") - col("__sx") * col("__sy"))
        .cast("long").as("cov_n2"),
      (col("__n") * col("__qx") - col("__sx") * col("__sx"))
        .cast("long").as("varx_n2"),
      (col("__n") * col("__qy") - col("__sy") * col("__sy"))
        .cast("long").as("vary_n2"),
      expr("""CASE WHEN (__n * __qx - __sx * __sx) <= 0
             |       OR (__n * __qy - __sy * __sy) <= 0
             |THEN CAST(NULL AS BIGINT)
             |ELSE CAST((CASE WHEN (__n * __pxy - __sx * __sy) < 0
             |             THEN -1 ELSE 1 END)
             |  * ((((__n * __pxy - __sx * __sy) * (__n * __pxy - __sx * __sy)
             |       div (__n * __qx - __sx * __sx)) * 1000000)
             |     div (__n * __qy - __sy * __sy)) AS BIGINT) END"""
        .stripMargin).as("rho2_ppm")): _*)
  }

  /** DuckDB replica of [[spearman]]: brute-force per-ROW doubled
    * midranks via `rank()`/partition counts (proving the marginal-cell
    * decomposition), HUGEINT moments, the identical staged division.
    * `srcSql` yields (groupCols…, x, y). */
  def spearmanOracleSql(srcSql: String, groupCols: Seq[String],
                        xCol: String, yCol: String): String = {
    val gl = groupCols.mkString(", ")
    val half = MilliRank / 2
    s"""WITH src AS (SELECT $gl, CAST($xCol AS BIGINT) AS x, CAST($yCol AS BIGINT) AS y
       |  FROM ($srcSql) WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL),
       |r AS (SELECT $gl,
       |    ((2 * rank() OVER (PARTITION BY $gl ORDER BY x)
       |      + count(*) OVER (PARTITION BY $gl, x) - 1) * $half)
       |      // count(*) OVER (PARTITION BY $gl) AS px,
       |    ((2 * rank() OVER (PARTITION BY $gl ORDER BY y)
       |      + count(*) OVER (PARTITION BY $gl, y) - 1) * $half)
       |      // count(*) OVER (PARTITION BY $gl) AS py
       |  FROM src),
       |m AS (SELECT $gl, CAST(count(*) AS HUGEINT) AS n,
       |    sum(CAST(px AS HUGEINT)) AS sx, sum(CAST(py AS HUGEINT)) AS sy,
       |    sum(CAST(px AS HUGEINT) * px) AS qx,
       |    sum(CAST(py AS HUGEINT) * py) AS qy,
       |    sum(CAST(px AS HUGEINT) * py) AS pxy
       |  FROM r GROUP BY $gl)
       |SELECT $gl, CAST(n AS BIGINT) AS n,
       |  CAST(n * pxy - sx * sy AS BIGINT) AS cov_n2,
       |  CAST(n * qx - sx * sx AS BIGINT) AS varx_n2,
       |  CAST(n * qy - sy * sy AS BIGINT) AS vary_n2,
       |  CASE WHEN n * qx - sx * sx <= 0 OR n * qy - sy * sy <= 0
       |  THEN CAST(NULL AS BIGINT)
       |  ELSE CAST((CASE WHEN n * pxy - sx * sy < 0 THEN -1 ELSE 1 END)
       |    * ((((n * pxy - sx * sy) * (n * pxy - sx * sy)
       |         // (n * qx - sx * sx)) * 1000000)
       |       // (n * qy - sy * sy)) AS BIGINT) END AS rho2_ppm
       |FROM m
       |ORDER BY $gl""".stripMargin
  }

  /** DuckDB replica of [[kendallTau]]: brute-force ROW pairs (proving
    * the cell-grid decomposition), HUGEINT counts, same signed-squared
    * emission. `srcSql` yields (groupCols…, x, y). */
  def kendallTauOracleSql(srcSql: String, groupCols: Seq[String],
                          xCol: String, yCol: String): String = {
    val gl = groupCols.mkString(", ")
    val ga = groupCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    s"""WITH src AS (SELECT $gl, CAST($xCol AS BIGINT) AS x, CAST($yCol AS BIGINT) AS y,
       |    row_number() OVER (PARTITION BY $gl ORDER BY $xCol, $yCol) AS rn
       |  FROM ($srcSql) WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL),
       |p AS (SELECT ${groupCols.map(c => s"a.$c").mkString(", ")},
       |    a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
       |  FROM src a JOIN src b ON $ga AND a.rn < b.rn),
       |agg AS (SELECT $gl,
       |    CAST(sum(CASE WHEN (xa < xb AND ya < yb) OR (xa > xb AND ya > yb)
       |      THEN 1 ELSE 0 END) AS HUGEINT) AS cc,
       |    CAST(sum(CASE WHEN (xa < xb AND ya > yb) OR (xa > xb AND ya < yb)
       |      THEN 1 ELSE 0 END) AS HUGEINT) AS dd,
       |    CAST(sum(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS HUGEINT) AS tx,
       |    CAST(sum(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS HUGEINT) AS ty,
       |    CAST(sum(CASE WHEN xa = xb AND ya = yb THEN 1 ELSE 0 END) AS HUGEINT) AS txy
       |  FROM p GROUP BY $gl),
       |cnt AS (SELECT $gl, CAST(count(*) AS HUGEINT) AS n FROM src GROUP BY $gl)
       |SELECT $gl, CAST(n AS BIGINT) AS n,
       |  CAST(coalesce(cc, 0) AS BIGINT) AS concordant,
       |  CAST(coalesce(dd, 0) AS BIGINT) AS discordant,
       |  CAST(coalesce(tx, 0) AS BIGINT) AS t_x,
       |  CAST(coalesce(ty, 0) AS BIGINT) AS t_y,
       |  CAST(coalesce(txy, 0) AS BIGINT) AS t_xy,
       |  CASE WHEN (n * (n - 1)) // 2 - coalesce(tx, 0) <= 0
       |         OR (n * (n - 1)) // 2 - coalesce(ty, 0) <= 0
       |  THEN CAST(NULL AS BIGINT)
       |  ELSE CAST((CASE WHEN coalesce(cc, 0) < coalesce(dd, 0) THEN -1 ELSE 1 END)
       |    * (((coalesce(cc, 0) - coalesce(dd, 0))
       |        * (coalesce(cc, 0) - coalesce(dd, 0)) * 1000000)
       |       // (((n * (n - 1)) // 2 - coalesce(tx, 0))
       |          * ((n * (n - 1)) // 2 - coalesce(ty, 0)))) AS BIGINT) END AS tau2_ppm
       |FROM cnt LEFT JOIN agg USING ($gl)
       |ORDER BY $gl""".stripMargin
  }
}
