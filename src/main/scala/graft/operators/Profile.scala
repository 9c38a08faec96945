package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-quality audit a pipeline runs
  * before trusting a 100 TB drop: per-column row/null counts, exact
  * distinct, and an HLL distinct ESTIMATE from mergeable register
  * state, in a single scan of the table.
  *
  * Scale shape: the table is read once; columns are stacked into
  * (column, value) pairs in the projection (cols× rows into the
  * aggregations, but each aggregation is map-side combined, so the
  * shuffle carries per-partition partials — counts and ≤2^b registers
  * per column — not rows). The exact-distinct leg is the expensive
  * one and exists to calibrate the estimate; at true 100 TB scale you
  * run [[profileApprox]] and skip it.
  *
  * Determinism of the HLL estimate: registers are integers; the
  * harmonic sum Z = Σ 2^-r is a sum of dyadic rationals spanning ≤ 52
  * bits, so every partial sum is EXACT in double regardless of
  * summation order — the estimate is a pure function of the register
  * multiset, and `floor(est)` is oracle-stable. The small-range
  * branch's `ln` is taken of one integer ratio (same q47/q81 rule).
  *
  * Values are profiled over their canonical string form; profile
  * floating-point columns only after quantizing them (float→string
  * rendering is not a cross-engine contract).
  */
object Profile {

  val HllBits = 10

  private def alpha(m: Int): Double =
    if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
    else if (m == 64) 0.709
    else if (m == 32) 0.697
    else 0.673

  /** (column, value) stack: one row per (row, profiled column). */
  private def stacked(df: DataFrame, cols: Seq[(String, Column)]): DataFrame =
    df.select(explode(array(cols.map { case (name, c) =>
        struct(lit(name).as("c"), c.cast("string").as("v"))
      }: _*)).as("s"))
      .select(col("s.c").as("c"), col("s.v").as("v"))

  /** The standard HLL estimate as a Column over per-column aggregates
    * `present` (# non-zero registers) and `zsum` (Σ 2^-register over
    * them): absent buckets contribute 2^0 = 1 each, zeros = m−present
    * (every seen bucket has register ≥ 1). */
  private[operators] def estimate(m: Int, present: Column, zsum: Column): Column = {
    val raw = lit(alpha(m) * m * m) / ((lit(m.toDouble) - present.cast("double")) + zsum)
    val zeros = lit(m.toLong) - present
    when(raw <= lit(2.5 * m) && zeros > 0L,
      floor(lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))))
      .otherwise(floor(raw))
      .cast("long")
  }

  /** Full profile: (column, n_rows, n_nulls, exact_distinct,
    * distinct_est) per profiled column, one table scan (plus the
    * exact-distinct expansion). `cols` maps output names to value
    * expressions — usually just `col(name)`.
    *
    * EAGER: checkpointing the stacked frame runs a Spark job at call
    * time in the default [[Materialize]] mode. */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val st = Materialize.once(stacked(df, cols))
    profileApprox(st).join(
      st.groupBy("c").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("exact_distinct")),
      Seq("c"))
      .select(col("c").as("column"), col("n_rows"), col("n_nulls"),
        col("exact_distinct"), col("distinct_est"))
  }

  /** The scale path: distinct estimates only — counts and registers,
    * no exact-distinct expansion. Input is a (c, v) stack. */
  private def profileApprox(st: DataFrame): DataFrame = {
    val m = 1 << HllBits
    st.filter(col("v").isNotNull)
      .select(col("c"),
        Sketches.hllBucket(col("v"), HllBits).as("bucket"),
        Sketches.hllRegister(col("v"), HllBits).as("register"))
      .groupBy("c", "bucket").agg(max("register").as("r"))
      .groupBy("c").agg(count(lit(1)).as("present"),
        sum(pow(lit(2.0), -col("r"))).as("zsum"))
      .select(col("c"), estimate(m, col("present"), col("zsum")).as("distinct_est"))
  }
}
