package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint` with CLAMPED size statistics.
  *
  * Spark's `Dataset.localCheckpoint` wraps the materialized RDD in a
  * [[LogicalRDD]] that CARRIES THE ORIGIN PLAN'S STATISTICS. Catalyst's
  * size-only estimator prices a join as the PRODUCT of its children's
  * `sizeInBytes`, so a checkpointed multi-join frame inherits a product
  * of sizes — and an ITERATIVE operator that checkpoints each round
  * (PageRank, label propagation, Louvain levels) compounds products of
  * products: the BigInt bit-length grows geometrically per round, until
  * the planner spends CPU-minutes inside `BigInteger.multiply` just
  * ESTIMATING a tiny graph's round plan (observed: multi-level Louvain
  * on a 14-node spec fixture, minutes per level by level 5, pure
  * ToomCook3 in the stats visitor).
  *
  * The fix: after checkpointing, if the carried estimate exceeds
  * `spark.sql.defaultSizeInBytes` (the "unknown, assume huge" ceiling —
  * such an estimate is informationless anyway: it already exceeds any
  * real frame), re-wrap the SAME RDD with the estimate clamped to that
  * ceiling, keeping any row count. Real, small estimates pass through
  * untouched, so auto-broadcast of genuinely small checkpoints still
  * works; only the runaway products are cut, which bounds every plan's
  * stats arithmetic to O(#leaves) 64-bit factors per round regardless
  * of iteration depth.
  */
object CheckpointStats {

  def clampedLocalCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    cp.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = cp.sparkSession.asInstanceOf[ClassicSession]
        val cap = BigInt(spark.sessionState.conf.defaultSizeInBytes)
        val st = lr.stats
        if (st.sizeInBytes <= cap) cp
        else Dataset.ofRows(spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(spark,
            Some(Statistics(sizeInBytes = cap, rowCount = st.rowCount)),
            None))
      case _ => cp
    }
  }
}
