package graft.operators

import org.apache.spark.sql.DataFrame
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
       |${pairSelects.mkString("UNION ALL\n")}""".stripMargin
  }
}
