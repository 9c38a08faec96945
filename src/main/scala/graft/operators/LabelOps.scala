package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label aggregation for multiply-annotated data — majority vote with
  * a deterministic tie-break and an exact agreement score. The
  * consolidation step of every weak-supervision / crowd-labeling
  * pipeline (and of noisy-source reconciliation generally): many
  * (item, label) observations in, one winning label per item out.
  *
  * Winner = most votes, ties to the LEXICALLY SMALLEST label — a
  * total order, so the result is partitioning- and engine-invariant.
  * agreement_ppm = (10⁶ · winner_votes) div total_votes, exact
  * integer.
  *
  * 100 TB shape: one map-side-combined shuffle to (item, label)
  * counts, then one shuffle to items, where the winner is a single
  * struct-min aggregate (votes negated so MIN orders by votes desc,
  * then label asc) — never a window sort over the vote table. Null
  * items and null labels are dropped (an abstention, not a vote).
  */
object LabelOps {

  /** @return (keyCol, label, votes, total_votes, n_labels,
    *         agreement_ppm) — one row per key, ordered by key */
  def majorityVote(df: DataFrame, keyCol: String, labelCol: String): DataFrame = {
    val counts = df
      .select(col(keyCol).as("__k"), col(labelCol).cast("string").as("__l"))
      .where(col("__k").isNotNull && col("__l").isNotNull)
      .groupBy("__k", "__l").agg(count(lit(1)).as("__votes"))
    counts
      .groupBy("__k")
      .agg(min(struct((-col("__votes")).as("nv"), col("__l").as("l")))
          .as("__w"),
        sum(col("__votes")).as("total_votes"),
        count(lit(1)).as("n_labels"))
      .select(col("__k").as(keyCol),
        col("__w.l").as("label"),
        (-col("__w.nv")).as("votes"),
        col("total_votes"), col("n_labels"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * -__w.nv) div total_votes")
          .as("agreement_ppm"))
      .orderBy(keyCol)
  }
}
