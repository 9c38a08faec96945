package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator battery: ETL-parity operators (SURVEY §2),
  * text-analysis / dedup operators over `documents`, and vector
  * similarity over `embeddings`. Each query has a DuckDB oracle unless
  * marked rows-only (non-SQL-expressible).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-by-day (SURVEY §7.2's end-to-end slice query): exercises
    * scan, date bucketing, exact decimal aggregation — and returns ~1.1k
    * rows, a robust smoke signal. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.q2RevenueByDay(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      HygieneQueries.queries ++ SketchQueries.queries ++
      WarehouseQueries.queries ++ AnalyticsQueries.queries ++
      MiningQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlQueries.oracles ++ TextQueries.oracles ++ VectorQueries.oracles ++
      HygieneQueries.oracles ++ SketchQueries.oracles ++
      WarehouseQueries.oracles ++ AnalyticsQueries.oracles ++
      MiningQueries.oracles
}
