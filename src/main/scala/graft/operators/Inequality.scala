package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Concentration / inequality metrics over per-key mass: exact Gini
  * coefficient, Herfindahl–Hirschman index, and top-1 share — the
  * standard audit of how skewed a corpus is (revenue per customer,
  * tokens per source domain, documents per license). A training-data
  * pipeline reads these to decide whether a source needs capping
  * before it dominates a mixture.
  *
  * Gini uses the rank identity `G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)`
  * over ascending-sorted mass — computed TIE-INVARIANTLY without a
  * row-level sort: for each DISTINCT mass value v with count c and
  * N_less keys strictly below it, the ranks it occupies contribute
  * `v·(c·N_less + c·(c+1)/2)`, so Σᵢ i·x₍ᵢ₎ needs only one aggregate
  * per distinct value plus a cumulative count over the distinct-value
  * spine. Swapping equal values never changes the sum, so any tie
  * order gives the same integer — no tie-break pin needed.
  *
  * Exact integer arithmetic end-to-end in DECIMAL(38,0) (HUGEINT on
  * the oracle side): with n ≤ 10⁹ keys of mass ≤ 10¹² the largest
  * intermediate `2·Σ i·x ≤ 2·n²·x_max ~ 10³⁰` stays far inside 38
  * digits; ppm quotients floor-divide identically on both engines.
  *
  * Scale shape: one (key → mass) aggregate, one (mass → count)
  * aggregate, then a cumulative over the DISTINCT-MASS spine computed
  * as a RANGE-PARTITIONED two-level prefix sum: each range partition
  * owns a contiguous value interval, the running count is a window
  * WITHIN partitions, and the cross-partition offset is a
  * partition-count-sized control-plane frame broadcast back. No
  * single-task global sort at any spine cardinality — an all-distinct
  * cents-valued mass over 10⁹ keys fans across the cluster instead of
  * funneling through one task. HHI/top-share are plain aggregates of
  * the key frame.
  *
  * Reference semantics: the reference reports per-store revenue
  * rollups (vivek-neenopal/shopify-etl merge jobs); this is the
  * concentration audit over exactly such rollups.
  */
object Inequality {

  /** @param df fact rows; mass per key = Σ valCol (must be ≥ 0)
    * @return one row: (n_keys, total, gini_ppm, hhi_ppm,
    *         top1_share_ppm); NULL ppm metrics when total = 0 */
  def concentration(df: DataFrame, keyCol: String,
                    valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val mass = Materialize.once(df
      .filter(col(keyCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(sum(col(valCol).cast("long")).as("__x")))
    val neg = mass.filter(col("__x") < 0).limit(1).count()
    require(neg == 0, "concentration: negative per-key mass — Gini is " +
      "defined over nonnegative mass; filter or clamp upstream")
    // distinct-mass spine with counts, cumulative strictly-below count.
    // Two-level prefix sum: range-partition the spine on __v (each
    // partition = one contiguous, disjoint value interval; distinct
    // keys so no boundary ties), run the cumulative window WITHIN
    // partitions, and add the total count of all lower intervals via a
    // broadcast of the ≤#partitions-row offset frame. Materialize.once
    // pins one bucketing for both reads (range boundaries come from
    // sampling a nondeterministically-ordered agg output).
    val spine = mass.groupBy(col("__x").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val parts = math.max(1,
      df.sparkSession.sparkContext.defaultParallelism)
    val bucketed = Materialize.once(spine
      .repartitionByRange(parts, col("__v"))
      .withColumn("__b", spark_partition_id()))
    // cross-bucket offsets: single-partition window is fine HERE — the
    // frame is ≤ `parts` rows (control-plane), never spine-sized
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__bt"))
      .withColumn("__off", sum(col("__bt")).over(wOff) - col("__bt"))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = bucketed
      .withColumn("__nleLocal", sum(col("__c")).over(wIn))
      .join(broadcast(offsets), Seq("__b"))
      .select(col("__v"), col("__c"),
        (col("__nleLocal") + col("__off") - col("__c")).as("__nl"))
    val six = ranked.agg(
      sum(expr(s"CAST(__v AS $dec) * (CAST(__c AS $dec) * CAST(__nl AS $dec)" +
        s" + (CAST(__c AS $dec) * (CAST(__c AS $dec) + 1)) div 2)"))
        .as("__six"))
    val base = mass.agg(
      count(lit(1)).as("n_keys"), sum(col("__x")).as("total"),
      sum(expr(s"CAST(__x AS $dec) * CAST(__x AS $dec)")).as("__sq"),
      max(col("__x")).as("__mx"))
    base.crossJoin(six).select(
      col("n_keys"), col("total"),
      expr(s"""CASE WHEN total = 0 THEN NULL ELSE CAST(
        ((2 * __six - (CAST(n_keys AS $dec) + 1) * CAST(total AS $dec))
          * 1000000) div (CAST(n_keys AS $dec) * CAST(total AS $dec))
        AS BIGINT) END""").as("gini_ppm"),
      expr(s"""CASE WHEN total = 0 THEN NULL ELSE CAST(
        (__sq * 1000000) div (CAST(total AS $dec) * CAST(total AS $dec))
        AS BIGINT) END""").as("hhi_ppm"),
      expr(s"""CASE WHEN total = 0 THEN NULL ELSE CAST(
        (CAST(__mx AS $dec) * 1000000) div CAST(total AS $dec)
        AS BIGINT) END""").as("top1_share_ppm"))
  }

  /** DuckDB replica of [[concentration]] (HUGEINT): identical rank
    * identity over the distinct-mass spine. `relSql` yields (k, x). */
  def concentrationOracleSql(relSql: String): String =
    s"""WITH mass AS (SELECT k, CAST(sum(CAST(x AS BIGINT)) AS HUGEINT) AS x
       |  FROM ($relSql) WHERE k IS NOT NULL AND x IS NOT NULL GROUP BY k),
       |spine AS (SELECT x AS v, CAST(count(*) AS HUGEINT) AS c
       |  FROM mass GROUP BY x),
       |rk AS (SELECT v, c,
       |    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS nl
       |  FROM spine),
       |six AS (SELECT sum(v * (c * nl + (c * (c + 1)) // 2)) AS six FROM rk),
       |base AS (SELECT CAST(count(*) AS HUGEINT) AS n_keys,
       |    sum(x) AS total, sum(x * x) AS sq, max(x) AS mx FROM mass)
       |SELECT CAST(n_keys AS BIGINT) AS n_keys, CAST(total AS BIGINT) AS total,
       |  CASE WHEN total = 0 THEN NULL ELSE CAST(
       |    ((2 * six - (n_keys + 1) * total) * 1000000)
       |      // (n_keys * total) AS BIGINT) END AS gini_ppm,
       |  CASE WHEN total = 0 THEN NULL ELSE CAST(
       |    (sq * 1000000) // (total * total) AS BIGINT) END AS hhi_ppm,
       |  CASE WHEN total = 0 THEN NULL ELSE CAST(
       |    (mx * 1000000) // total AS BIGINT) END AS top1_share_ppm
       |FROM base, six""".stripMargin
}
