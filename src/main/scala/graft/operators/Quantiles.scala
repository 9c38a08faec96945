package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact (not approximate) grouped percentiles by rank selection —
  * the summary-statistics operator for skew diagnosis, SLA reporting
  * and sampling-threshold calibration, where `percentile_approx`'s
  * error bound is not acceptable.
  *
  * Semantics: discrete (type-1) quantile — the value at 1-indexed rank
  * `max(1, ceil(n·p/100))` of the group's ascending sort. The target
  * rank is computed in INTEGER arithmetic (`(n·p + 99) div 100`), not
  * via `ceil(double·double)`: `0.95·n` is not exact in binary and its
  * ceil can land one rank off the mathematical answer at exact
  * multiples. The selected VALUE is emitted untouched (no arithmetic),
  * so the result is engine-portable for any orderable column type.
  *
  * 100 TB shape: one hash shuffle on the group key, then a
  * partition-local sort (WindowExec spills to disk past memory, so a
  * single giant group degrades but does not OOM). The percent list
  * rides as an exploded literal array — no extra shuffle, no join.
  * For a handful of global quantiles over a single colossal group,
  * prefer a two-phase histogram-refine selection (bucket counts →
  * re-scan the one target bucket); this operator is the exact grouped
  * path where groups are plentiful and the sort parallelizes.
  */
object Quantiles {

  /** Exact per-group percentile values.
    *
    * @param pcts integer percents in (0, 100], e.g. Seq(25, 50, 75, 95, 99)
    * @return keyCols ++ (pct, pct_value, n) — one row per (group, pct)
    */
  def exactPercentiles(df: DataFrame, keyCols: Seq[String], valCol: String,
                       pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      s"percents must be in (0, 100]: $pcts")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(valCol))
    val wAll = Window.partitionBy(keys: _*)
    val ranked = df.select(keys :+ col(valCol): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    ranked
      .select(keys ++ Seq(col(valCol), col("__rn"), col("__n"),
        explode(array(pcts.map(lit): _*)).as("pct")): _*)
      // integer ceil-division: rank = max(1, ceil(n*pct/100)) exactly
      .filter(col("__rn") === greatest(lit(1L), expr("(__n * pct + 99) div 100")))
      .select(keys ++ Seq(col("pct"), col(valCol).as("pct_value"),
        col("__n").as("n")): _*)
  }
}
