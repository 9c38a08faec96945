package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) query — the "best trade-off" operator of
  * classic OLAP (Börzsönyi et al., ICDE'01): rows not DOMINATED by any
  * other row, where a dominates b iff a.x ≤ b.x ∧ a.y ≤ b.y with at
  * least one strict (both dimensions minimized; negate a column to
  * maximize it). Duplicate points dominate each other in neither
  * direction, so both survive — matching the NOT EXISTS oracle
  * rendering exactly.
  *
  * Scale shape — the naive formulation is a quadratic self-join; a
  * single global sort + running-min window is exact but single-
  * partition. This implementation is the two-phase histogram-prune
  * pattern (same philosophy as Quantiles.exactGlobalPercentiles):
  *
  *  1. PRUNE, fully distributed: bucket x by `bucketWidth`; one
  *     map-side-combined aggregate gives each bucket's min y; a
  *     running min over the bucket table (bucket-histogram-sized by
  *     contract, hundreds of rows) gives pm(b) = min y of all buckets
  *     STRICTLY before b. Any row with y ≥ pm(bucket) is dominated by
  *     that earlier-bucket witness (its x is strictly smaller since
  *     buckets partition x by value): drop it with one broadcast
  *     filter over the full table.
  *  2. EXACT, survivor-sized: survivors per bucket all beat every
  *     earlier bucket's best y, so their count is bounded by the
  *     bucket count × per-bucket skyline size — skyline-sized, not
  *     data-sized. Finish with the exact two-window dominance test
  *     (x' < x witnesses and x' = x witnesses separately) on the tiny
  *     survivor frame.
  *
  * All comparisons are on long integers — no float boundary; the
  * result is engine-exact vs the NOT EXISTS oracle.
  */
object Skyline {

  /** Skyline of (xCol, yCol), both minimized, both long-valued.
    * Returns the input rows that survive, unmodified. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val bucketed = df.withColumn("__b", expr(s"CAST($xCol AS BIGINT) div $bucketWidth"))
    // bucket histogram: min y per bucket, then min over all STRICTLY
    // EARLIER buckets (window over the bucket table only)
    val prior = bucketed.groupBy("__b").agg(min(y).as("__by"))
      .withColumn("__pm", min(col("__by")).over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__pm"))
    val survivors = Materialize.once(
      bucketed.join(broadcast(prior), Seq("__b"))
        .filter(col("__pm").isNull || y < col("__pm")))
    // exact dominance on the survivor frame: a witness with x' < x and
    // y' ≤ y, or x' = x and y' < y, kills the row; same-point
    // duplicates kill nothing (handled by counting strictly-better
    // same-x rows rather than comparing mins alone)
    val wPrev = Window.orderBy(x).rangeBetween(Window.unboundedPreceding, -1)
    val wTie = Window.partitionBy(x)
    survivors
      .withColumn("__m1", min(y).over(wPrev))          // best y with x' < x
      .withColumn("__mt", min(y).over(wTie))           // best y among x' = x
      .filter((col("__m1").isNull || y < col("__m1")) && y <= col("__mt"))
      .drop("__b", "__pm", "__m1", "__mt")
  }

  /** NOT EXISTS oracle rendering for [[skyline2d]] over `relSql`
    * (already projecting xCol/yCol as longs). */
  def skylineOracleSql(relSql: String, xCol: String, yCol: String,
                       selectCols: String): String =
    s"""WITH rel AS ($relSql)
       |SELECT $selectCols FROM rel r
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM rel o
       |  WHERE o.$xCol <= r.$xCol AND o.$yCol <= r.$yCol
       |    AND (o.$xCol < r.$xCol OR o.$yCol < r.$yCol))""".stripMargin
}
