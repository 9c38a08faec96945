package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectation-suite data-quality reporting: declarative checks
  * (nulls, domains, ranges, key uniqueness, referential integrity)
  * evaluated into one uniform violation report — the pre-merge gate a
  * warehouse pipeline runs before promoting a batch (the reference
  * gates merges on row-count audits; cf. vivek-neenopal/shopify-etl
  * sql/ merge checks — this generalizes that audit into a typed
  * suite).
  *
  * Scale shape: every scan-level check is a VIOLATION predicate folded
  * into a single conditional-sum aggregate — k checks over a 100 TB
  * table cost ONE pass, not k. Key-uniqueness adds one exact-distinct
  * shuffle on the key; referential integrity adds one anti-join (both
  * sides shuffle on the key — broadcast the parent side upstream if it
  * is dimension-sized). Every report row is (table, check, n_checked,
  * n_violations, pass), so suites union into one frame regardless of
  * which checks produced them.
  */
object DataQuality {

  private def row(table: String, check: Column, nChecked: Column,
                  nViolations: Column): Seq[Column] = Seq(
    lit(table).as("table_name"), check.as("check_name"),
    nChecked.cast("long").as("n_checked"),
    nViolations.cast("long").as("n_violations"))

  /** All `checks` (name → violation predicate) in ONE scan of `df`. */
  def scanReport(df: DataFrame, table: String,
                 checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "scanReport: no checks given")
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (n, p) =>
        sum(when(p, 1L).otherwise(0L)).as(s"__v_$n") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(checks.map { case (n, _) =>
      struct(lit(n).as("c"), coalesce(col(s"__v_$n"), lit(0L)).as("v")) }: _*)
    one.select(explode(entries).as("e"), col("__n"))
      .select(row(table, col("e.c"), col("__n"), col("e.v")) :+
        (col("e.v") === 0).as("pass"): _*)
  }

  /** Key-uniqueness check: violations = rows beyond the first per key
    * (n − distinct keys); NULL keys never count as "the same key" —
    * they are each their own violation, reported by a separate
    * null-check if desired. */
  def uniqueKey(df: DataFrame, table: String, keyCols: Seq[String]): DataFrame = {
    val ks = keyCols.map(col)
    val one = df.agg(count(lit(1)).as("__n"),
      count_distinct(ks.head, ks.tail: _*).as("__d"),
      sum(when(ks.map(_.isNull).reduce(_ || _), 1L).otherwise(0L)).as("__nulls"))
    one.select(row(table, lit(s"unique_${keyCols.mkString("_")}"),
      col("__n"), col("__n") - col("__d") - col("__nulls")) :+
      (col("__n") - col("__d") - col("__nulls") === 0).as("pass"): _*)
  }

  /** Referential-integrity check: child rows whose key has no parent.
    * NULL child keys are skipped (they are a null-check's business). */
  def referential(child: DataFrame, childTable: String, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.select(col(childKey)).where(col(childKey).isNotNull)
    val orphans = keyed.join(
      parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    val one = keyed.agg(count(lit(1)).as("__n"))
      .crossJoin(orphans.agg(count(lit(1)).as("__o")))
    one.select(row(childTable, lit(s"fk_${childKey}"),
      col("__n"), col("__o")) :+ (col("__o") === 0).as("pass"): _*)
  }
}
