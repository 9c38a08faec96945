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

  /** One Dawid–Skene-flavoured EM round, integer-exact: score each
    * ANNOTATOR by agreement with the plain majority (reliability in
    * ppm), then re-vote with each annotation weighted by its
    * annotator's reliability. Catches the "three careless annotators
    * outvote one careful one" failure majority voting has; one round
    * (rather than EM-to-convergence) keeps the arithmetic exact and
    * the cost two fixed passes.
    *
    * Weighted winner = max Σ reliability_ppm, ties to the lexically
    * smallest label. reliability_ppm = (10⁶ · #votes that matched the
    * round-1 majority) div #votes — annotators who always dissent
    * weigh 0; the guaranteed-nonempty majority side keeps every item
    * decidable.
    *
    * 100 TB shape: round 1 is [[majorityVote]]'s two shuffles; the
    * reliability table is one aggregate on the annotator key,
    * broadcast back onto the vote table (annotator sets are dim-sized
    * by contract); the re-vote is the same two keyed aggregates with
    * weights in place of counts.
    *
    * @return (keyCol, label, weight_ppm, n_voters) per key, ordered
    */
  def reliabilityWeightedVote(df: DataFrame, keyCol: String,
                              annotatorCol: String, labelCol: String): DataFrame = {
    val votes = df
      .select(col(keyCol).as("__k"), col(annotatorCol).as("__a"),
        col(labelCol).cast("string").as("__l"))
      .where(col("__k").isNotNull && col("__a").isNotNull && col("__l").isNotNull)
      .transform(Materialize.once)
    val majority = majorityVote(votes, "__k", "__l")
      .select(col("__k"), col("label").as("__maj"))
    val reliability = votes
      .join(majority, Seq("__k"))
      .groupBy(col("__a"))
      .agg(expr("(CAST(1000000 AS DECIMAL(38,0)) * " +
        "sum(CASE WHEN __l = __maj THEN 1 ELSE 0 END)) div count(*)")
        .as("__rel"))
    votes.join(broadcast(reliability), Seq("__a"))
      .groupBy("__k", "__l")
      .agg(sum(col("__rel")).as("__w"), count(lit(1)).as("__nv"))
      .groupBy("__k")
      .agg(min(struct((-col("__w")).as("nw"), col("__l").as("l"))).as("__win"),
        sum(col("__nv")).as("n_voters"))
      .select(col("__k").as(keyCol), col("__win.l").as("label"),
        (-col("__win.nw")).as("weight_ppm"), col("n_voters"))
      .orderBy(keyCol)
  }
}
