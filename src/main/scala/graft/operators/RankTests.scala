package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonparametric two-sample tests — the "did this cohort's
  * distribution actually shift" screens an experimentation or
  * curation pipeline runs before trusting a mean delta: the
  * Mann–Whitney rank-sum statistic (Mann & Whitney, AoMS 1947) and
  * the two-sample Kolmogorov–Smirnov distance — plus the one-vs-rest
  * generalization [[aucOneVsRest]] (per-group ROC-AUC against the
  * rest of the corpus in a single pass). All are EXACT
  * integer computations here — midranks are carried doubled
  * (2·midrank is always an integer) and ECDF differences are carried
  * cross-multiplied on the common denominator n_a·n_b — so every
  * statistic hash-matches a DuckDB oracle with no float boundary.
  *
  * Scale shape (both tests): one value-keyed map-side-combined
  * aggregate collapses N rows to the distinct-value histogram with
  * per-group counts; global prefix counts over that histogram come
  * from the two-phase bucket trick (Quantiles.exactGlobalPercentiles,
  * Diversity.gini) — a bucket-histogram-sized window (broadcast) plus
  * a window PARTITIONED by bucket — so no global single-partition
  * sort ever touches a data-sized frame.
  */
object RankTests {

  /** Resolve the two group labels (lexicographic: a < b). */
  private def twoGroups(df: DataFrame, grpCol: String): (String, String) = {
    val gs = df.select(col(grpCol).cast("string")).na.drop()
      .distinct().collect().map(_.getString(0)).sorted
    require(gs.length == 2,
      s"expected exactly 2 groups in $grpCol, got ${gs.length}")
    (gs(0), gs(1))
  }

  /** Distinct-value histogram with per-group counts and the GLOBAL
    * count of rows strictly below each value (two-phase, no global
    * sort): (__v, __ca, __cb, __t, __lt). */
  private def histogram(df: DataFrame, grpCol: String, valCol: String,
                        ga: String, bucketWidth: Long): DataFrame = {
    val v = col(valCol).cast("long")
    val g = col(grpCol).cast("string")
    val cnt = df.filter(v.isNotNull && g.isNotNull)
      .groupBy(v.as("__v"))
      .agg(sum(when(g === ga, 1L).otherwise(0L)).as("__ca"),
        sum(when(g =!= ga, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
      .withColumn("__bk", expr(s"__v div $bucketWidth"))
    val offsets = cnt.groupBy("__bk").agg(sum(col("__t")).as("__c"))
      .withColumn("__pc", coalesce(sum(col("__c")).over(
        Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bk"), col("__pc"))
    cnt.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__lt", col("__pc") + coalesce(
        sum(col("__t")).over(Window.partitionBy("__bk").orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bk", "__pc")
  }

  /** Mann–Whitney U for the two groups of `grpCol` over long-valued
    * `valCol`, ties by midrank. Integers only: at each distinct value
    * the doubled rank-sum contribution of group a is
    * `ca · (2·lt + t + 1)` (lt = rows strictly below, t = ties), so
    * `u2_a = Σ − n_a·(n_a+1)` is exactly 2·U_a. The common-language
    * effect size P(X_a > X_b) + ½P(=) lands as
    * `cles_ppm = u2_a·10⁶ div (2·n_a·n_b)`.
    *
    * @return one row: (grp_a, grp_b, n_a, n_b, u2_a, cles_ppm)
    */
  def mannWhitney(df: DataFrame, grpCol: String, valCol: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val (ga, gb) = twoGroups(df, grpCol)
    histogram(df, grpCol, valCol, ga, bucketWidth)
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__ca").cast("decimal(38,0)")
          * (lit(2) * col("__lt") + col("__t") + 1)).as("__r2a"))
      .select(lit(ga).as("grp_a"), lit(gb).as("grp_b"),
        col("n_a"), col("n_b"),
        (col("__r2a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1))
          .cast("long").as("u2_a"))
      .withColumn("cles_ppm", expr(
        """CAST(CAST(u2_a AS DECIMAL(38,0)) * 1000000
          |  div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
          .stripMargin))
  }

  /** DuckDB replay of [[mannWhitney]] over `relSql` projecting
    * (g, v); HUGEINT arithmetic, identical midrank identity. */
  def mannWhitneyOracleSql(relSql: String): String =
    s"""WITH rel AS (SELECT CAST(g AS VARCHAR) AS g, CAST(v AS BIGINT) AS v
       |             FROM ($relSql) WHERE g IS NOT NULL AND v IS NOT NULL),
       |ga AS (SELECT min(g) AS a, max(g) AS b FROM rel),
       |cnt AS (SELECT v,
       |          CAST(sum(CASE WHEN g = (SELECT a FROM ga) THEN 1 ELSE 0 END)
       |            AS HUGEINT) AS ca,
       |          CAST(sum(CASE WHEN g <> (SELECT a FROM ga) THEN 1 ELSE 0 END)
       |            AS HUGEINT) AS cb
       |        FROM rel GROUP BY v),
       |cum AS (SELECT ca, cb, ca + cb AS t,
       |          COALESCE(sum(ca + cb) OVER (ORDER BY v
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
       |        FROM cnt)
       |SELECT (SELECT a FROM ga) AS grp_a, (SELECT b FROM ga) AS grp_b,
       |  CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
       |  CAST(sum(ca * (2 * lt + t + 1)) - sum(ca) * (sum(ca) + 1)
       |    AS BIGINT) AS u2_a,
       |  CAST((sum(ca * (2 * lt + t + 1)) - sum(ca) * (sum(ca) + 1)) * 1000000
       |    // (2 * sum(ca) * sum(cb)) AS BIGINT) AS cles_ppm
       |FROM cum""".stripMargin

  /** One-vs-rest Mann–Whitney per group — [[mannWhitney]] generalized
    * to ANY number of groups in one pass: for every group g, the
    * doubled U statistic of g's values against ALL other rows and the
    * common-language effect size AUC = P(x_g > x_rest) + ½P(=) —
    * identically the ROC-AUC of the value as a classifier for the
    * group, the "which source scores systematically high" screen run
    * across a whole corpus mix at once (q185 answers it for one pair).
    *
    * Same exactness discipline: per distinct value the doubled
    * rank-sum contribution of group g is `a_g·(2·lt + t + 1)`
    * (a_g = g's rows at the value, lt/t global strictly-below/tie
    * counts), accumulated in DECIMAL(38,0);
    * `auc_ppm = u2·10⁶ div (2·n_g·n_rest)`, NULL for a single-group
    * table (no rest to compare).
    *
    * Scale shape: one (group × value) hash-agg, one value hash-agg,
    * the same two-phase bucket prefix as [[ksTwoSample]] (no global
    * single-partition window), and one value-keyed equi-join of the
    * group counts onto the value grid. Output is group-sized.
    *
    * @return (group, n_g, n_rest, u2, auc_ppm) ordered by group */
  def aucOneVsRest(df: DataFrame, grpCol: String, valCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val v = col(valCol).cast("long")
    val g = col(grpCol).cast("string")
    val rows = df.filter(v.isNotNull && g.isNotNull)
      .select(g.as("group"), v.as("__v"))
    val cnt = Materialize.once(rows
      .groupBy("__v").agg(count(lit(1)).as("__t"))
      .withColumn("__bk", expr(s"__v div $bucketWidth")))
    val offsets = cnt.groupBy("__bk").agg(sum(col("__t")).as("__c"))
      .withColumn("__pc", coalesce(sum(col("__c")).over(
        Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bk"), col("__pc"))
    val grid = cnt.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__lt", col("__pc") + coalesce(
        sum(col("__t")).over(Window.partitionBy("__bk").orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__v"), col("__t"), col("__lt"))
    val gc = rows.groupBy("group", "__v").agg(count(lit(1)).as("__a"))
    val total = rows.agg(count(lit(1)).as("__n"))
    gc.join(grid, Seq("__v"))
      .groupBy("group")
      .agg(sum(col("__a")).as("n_g"),
        sum(col("__a").cast("decimal(38,0)")
          * (lit(2) * col("__lt") + col("__t") + 1)).as("__r2"))
      .crossJoin(broadcast(total))
      .select(col("group"), col("n_g"),
        (col("__n") - col("n_g")).as("n_rest"),
        (col("__r2") - col("n_g").cast("decimal(38,0)") * (col("n_g") + 1))
          .cast("long").as("u2"))
      .withColumn("auc_ppm", when(col("n_rest") === 0, lit(null)
        .cast("long")).otherwise(expr(
        """CAST(CAST(u2 AS DECIMAL(38,0)) * 1000000
          |  div (2 * CAST(n_g AS DECIMAL(38,0)) * n_rest) AS BIGINT)"""
          .stripMargin)))
      .orderBy("group")
  }

  /** DuckDB replay of [[aucOneVsRest]] over `relSql` projecting
    * (g, v). */
  def aucOneVsRestOracleSql(relSql: String): String =
    s"""WITH rel AS (SELECT CAST(g AS VARCHAR) AS g, CAST(v AS BIGINT) AS v
       |             FROM ($relSql) WHERE g IS NOT NULL AND v IS NOT NULL),
       |cnt AS (SELECT v, CAST(count(*) AS HUGEINT) AS t FROM rel GROUP BY v),
       |grid AS (SELECT v, t, COALESCE(sum(t) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
       |  FROM cnt),
       |gc AS (SELECT g, v, CAST(count(*) AS HUGEINT) AS a
       |       FROM rel GROUP BY 1, 2),
       |pg AS (SELECT g, CAST(sum(a) AS HUGEINT) AS ng,
       |    CAST(sum(a * (2 * grid.lt + grid.t + 1)) AS HUGEINT) AS r2
       |  FROM gc JOIN grid USING (v) GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM rel)
       |SELECT g AS "group",
       |  CAST(ng AS BIGINT) AS n_g,
       |  CAST(n - ng AS BIGINT) AS n_rest,
       |  CAST(r2 - ng * (ng + 1) AS BIGINT) AS u2,
       |  CAST(CASE WHEN n - ng = 0 THEN NULL
       |    ELSE (r2 - ng * (ng + 1)) * 1000000 // (2 * ng * (n - ng))
       |    END AS BIGINT) AS auc_ppm
       |FROM pg, tot
       |ORDER BY "group"""".stripMargin

  /** Two-sample Kolmogorov–Smirnov distance for the two groups of
    * `grpCol`: D = max over values of |F_a(v) − F_b(v)|, carried
    * cross-multiplied — `d_num(v) = |cumA(v)·n_b − cumB(v)·n_a|` is an
    * integer, `ks_ppm = max·10⁶ div (n_a·n_b)`. The ECDF step points
    * are exactly the distinct values, so the histogram max IS the
    * supremum.
    *
    * @return one row: (grp_a, grp_b, n_a, n_b, ks_ppm)
    */
  def ksTwoSample(df: DataFrame, grpCol: String, valCol: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val (ga, gb) = twoGroups(df, grpCol)
    val v = col(valCol).cast("long")
    val g = col(grpCol).cast("string")
    // materialized once: read by the bucket offsets, the totals, and
    // the final cumulative scan
    val cnt = Materialize.once(df.filter(v.isNotNull && g.isNotNull)
      .groupBy(v.as("__v"))
      .agg(sum(when(g === ga, 1L).otherwise(0L)).as("__ca"),
        sum(when(g =!= ga, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__bk", expr(s"__v div $bucketWidth")))
    // per-group prefix counts need per-group bucket offsets
    val offsets = cnt.groupBy("__bk")
      .agg(sum(col("__ca")).as("__sa"), sum(col("__cb")).as("__sb"))
      .withColumn("__pa", coalesce(sum(col("__sa")).over(
        Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__pb", coalesce(sum(col("__sb")).over(
        Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bk"), col("__pa"), col("__pb"))
    val wIn = Window.partitionBy("__bk").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    // group totals driver-side (the operator is already eager via
    // twoGroups) so no data-sized global window is ever needed
    val trow = cnt.agg(sum(col("__ca")), sum(col("__cb"))).head()
    val (na, nb) = (trow.getLong(0), trow.getLong(1))
    require(na > 0 && nb > 0, s"both groups need rows: n_a=$na n_b=$nb")
    cnt.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__cumA", col("__pa") + sum(col("__ca")).over(wIn))
      .withColumn("__cumB", col("__pb") + sum(col("__cb")).over(wIn))
      .agg(max(abs(col("__cumA").cast("decimal(38,0)") * nb
        - col("__cumB").cast("decimal(38,0)") * na)).as("__dmax"))
      .select(lit(ga).as("grp_a"), lit(gb).as("grp_b"),
        lit(na).as("n_a"), lit(nb).as("n_b"),
        expr(s"""CAST(__dmax * 1000000
                |  div (CAST($na AS DECIMAL(38,0)) * $nb) AS BIGINT)"""
          .stripMargin).as("ks_ppm"))
  }

  /** DuckDB replay of [[ksTwoSample]] over `relSql` projecting (g, v). */
  def ksTwoSampleOracleSql(relSql: String): String =
    s"""WITH rel AS (SELECT CAST(g AS VARCHAR) AS g, CAST(v AS BIGINT) AS v
       |             FROM ($relSql) WHERE g IS NOT NULL AND v IS NOT NULL),
       |ga AS (SELECT min(g) AS a, max(g) AS b FROM rel),
       |cnt AS (SELECT v,
       |          CAST(sum(CASE WHEN g = (SELECT a FROM ga) THEN 1 ELSE 0 END)
       |            AS HUGEINT) AS ca,
       |          CAST(sum(CASE WHEN g <> (SELECT a FROM ga) THEN 1 ELSE 0 END)
       |            AS HUGEINT) AS cb
       |        FROM rel GROUP BY v),
       |cum AS (SELECT
       |          sum(ca) OVER (ORDER BY v
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
       |          sum(cb) OVER (ORDER BY v
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB
       |        FROM cnt),
       |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cnt)
       |SELECT (SELECT a FROM ga) AS grp_a, (SELECT b FROM ga) AS grp_b,
       |  CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
       |  CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
       |  CAST(max(abs(cumA * (SELECT nb FROM tot)
       |    - cumB * (SELECT na FROM tot))) * 1000000
       |    // ((SELECT na FROM tot) * (SELECT nb FROM tot)) AS BIGINT) AS ks_ppm
       |FROM cum""".stripMargin
}
