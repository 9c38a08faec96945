package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributional diagnostics for dataset curation — the "is this
  * corpus/revenue/traffic concentrated or diverse, and did the mix
  * move" measures a training-data pipeline runs before committing to a
  * source blend: Gini concentration, Simpson diversity, and pairwise
  * total-variation distance between group distributions. All three
  * are exact integer/ppm computations (no logs, no floats), so every
  * number hash-matches a DuckDB oracle.
  */
object Diversity {

  /** Gini coefficient of a NONNEGATIVE long-valued column, in ppm:
    * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the ascending sort
    * x₍₁₎…x₍ₙ₎ — revenue concentration across customers, token mass
    * across sources, the classic inequality measure.
    *
    * Global ranks WITHOUT a global sort (the same two-phase histogram
    * trick as Quantiles.exactGlobalPercentiles): bucket values by
    * `bucketWidth`, count per bucket, prefix-count over the bucket
    * histogram (bucket-table-sized window), then rank locally with a
    * window PARTITIONED by bucket and add the prefix offset. The sum
    * Σ i·x is invariant under tie order (equal x commute), so local
    * tie order cannot change the result. Arithmetic in DECIMAL(38,0)
    * — n²·x̄ overflows longs long before 100 TB does.
    *
    * @return one row (n, total, gini_ppm)
    */
  def gini(df: DataFrame, valCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val v = col(valCol).cast("long")
    val bucketed = df.filter(v.isNotNull && v >= 0)
      .select(v.as("__v"), expr(s"CAST($valCol AS BIGINT) div $bucketWidth").as("__b"))
    val offsets = bucketed.groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__pc", coalesce(sum(col("__c")).over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__b"), col("__pc"))
    val ranked = bucketed.join(broadcast(offsets), Seq("__b"))
      .withColumn("__i", (col("__pc") +
        row_number().over(Window.partitionBy("__b").orderBy("__v")))
        .cast("decimal(38,0)"))
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("total"),
        sum(col("__i") * col("__v").cast("decimal(38,0)")).as("__six"))
      .select(col("n"), col("total"),
        expr("""CAST((2 * __six - (CAST(n AS DECIMAL(38,0)) + 1) * CAST(total AS DECIMAL(38,0))) * 1000000
               |  div (CAST(n AS DECIMAL(38,0)) * CAST(total AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
          .as("gini_ppm"))
  }

  /** DuckDB rendering of [[gini]] over `relSql` projecting a single
    * nonnegative BIGINT column `v` (HUGEINT arithmetic is exact). */
  def giniOracleSql(relSql: String): String =
    s"""WITH rel AS ($relSql),
       |ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS i FROM rel
       |           WHERE v IS NOT NULL AND v >= 0)
       |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS total,
       |       CAST((2 * sum(CAST(i AS HUGEINT) * v) - (count(*) + 1) * sum(v))
       |            * 1000000 // (count(*) * sum(v)) AS BIGINT) AS gini_ppm
       |FROM ranked""".stripMargin

  /** Simpson diversity per group, in ppm:
    * D = 1 − Σᵢ nᵢ(nᵢ−1) / (N(N−1)) — the probability two draws
    * WITHOUT replacement land in different categories (1 = perfectly
    * diverse, 0 = monoculture). One two-level aggregate; exact single
    * floor at the end.
    *
    * @return per group: (groupCols..., n_cats, n_total, simpson_ppm);
    *         groups with N < 2 are dropped (the index is undefined)
    */
  def simpson(df: DataFrame, groupCols: Seq[String], catCol: String): DataFrame = {
    val cnt = df.groupBy((groupCols :+ catCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    cnt.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_cats"),
        sum(col("__n")).as("n_total"),
        sum(col("__n") * (col("__n") - 1)).as("__ss"))
      .filter(col("n_total") >= 2)
      .withColumn("simpson_ppm", expr(
        "((n_total * (n_total - 1) - __ss) * 1000000) div (n_total * (n_total - 1))"))
      .drop("__ss")
  }

  /** Pairwise total-variation distance between the `catCol`
    * distributions of every two groups, in ppm:
    * TV(a,b) = ½·Σ_t |p_a(t) − p_b(t)| — the source-mix drift measure
    * (0 = identical blend, 10⁶ = disjoint support).
    *
    * Exact rational arithmetic on the common denominator N_a·N_b:
    *   TV = (Σ_{t∈both} |n_a·N_b − n_b·N_a|
    *         + (N_a − Σ_{t∈both} n_a)·N_b
    *         + (N_b − Σ_{t∈both} n_b)·N_a) / (2·N_a·N_b)
    * where the two correction terms cover categories present on one
    * side only — so the category join can be INNER (one shuffle on the
    * category key), never a per-pair full outer. Pair scaffolding
    * (including zero-overlap pairs at TV = 10⁶) comes from the group
    * totals table, tiny by contract (it is the GROUP list), broadcast.
    *
    * @return (grp_a, grp_b, n_a, n_b, tv_ppm) for every grp_a < grp_b
    */
  def tvMatrix(df: DataFrame, grpCol: String, catCol: String): DataFrame = {
    val counts = df.groupBy(col(grpCol).as("__g"), col(catCol).as("__t"))
      .agg(count(lit(1)).as("__n"))
      .transform(Materialize.once) // read by totals + both join sides
    val totals = counts.groupBy("__g").agg(sum(col("__n")).as("__tot"))
    val pairs = totals.select(col("__g").as("grp_a"), col("__tot").as("n_a"))
      .join(totals.select(col("__g").as("grp_b"), col("__tot").as("n_b")),
        col("grp_a") < col("grp_b"))
    val shared = counts.select(col("__g").as("grp_a"), col("__t"), col("__n").as("na"))
      .join(counts.select(col("__g").as("grp_b"), col("__t"), col("__n").as("nb")),
        Seq("__t"))
      .filter(col("grp_a") < col("grp_b"))
      .join(broadcast(totals.select(col("__g").as("grp_a"), col("__tot").as("ta"))),
        Seq("grp_a"))
      .join(broadcast(totals.select(col("__g").as("grp_b"), col("__tot").as("tb"))),
        Seq("grp_b"))
      .groupBy("grp_a", "grp_b")
      .agg(sum(abs(col("na").cast("decimal(38,0)") * col("tb")
          - col("nb").cast("decimal(38,0)") * col("ta"))).as("__dboth"),
        sum(col("na")).as("__sa"), sum(col("nb")).as("__sb"))
    // pairs is the preserved side of the left join, so the build side
    // is `shared` (group-pair-sized); no hint — a left join cannot
    // build its preserved side
    pairs.join(shared, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        expr("""CAST((coalesce(__dboth, CAST(0 AS DECIMAL(38,0)))
               |  + (CAST(n_a AS DECIMAL(38,0)) - coalesce(__sa, 0)) * n_b
               |  + (CAST(n_b AS DECIMAL(38,0)) - coalesce(__sb, 0)) * n_a) * 1000000
               |  div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""".stripMargin)
          .as("tv_ppm"))
  }
}
