package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style data selection: hashed bag-of-tokens importance
  * weighting of a raw corpus against a target distribution (Xie et
  * al., "Data Selection for Language Models via Importance
  * Resampling", 2023 — the public method: estimate unigram bucket
  * distributions for target and raw, weight each raw document by the
  * log-likelihood ratio of its tokens).
  *
  * Per-document log weight (add-one smoothing over B hash buckets):
  * {{{
  *   log w(D) = sum over tokens x of
  *     ln(ct[h(x)]+1) - ln(cr[h(x)]+1) + ln(R+B) - ln(T+B)
  * }}}
  * where ct/cr are target/raw bucket occurrence counts and T/R their
  * totals. The subtraction form never multiplies counts, so it cannot
  * overflow at any corpus size (the ratio form's `(ct+1)·(R+B)`
  * product exceeds BIGINT near T·R ≈ 10¹⁸).
  *
  * 100 TB shape: the bucket-count table is at most B rows — built with
  * one tiny shuffle, then BROADCAST back onto the token stream, so
  * scoring is a map-side join plus the one per-doc aggregation
  * shuffle. The token stream feeds both passes and is checkpointed
  * once ([[Materialize.once]] — EAGER: runs a job at call time).
  * Target membership is a predicate on the corpus itself (in-corpus
  * proxy); a separate curated target corpus just swaps the count
  * source.
  *
  * Determinism contract: per-token contributions are quantized to
  * floor(x·10⁶) LONGs before the per-doc integer sum — identical
  * across engines and partitionings (the q112 oracle recomputes every
  * bucket count and contribution in DuckDB).
  */
object Dsir {

  /** Per-doc quantized log importance weight vs a target predicate.
    *
    * @param targetPred rows where this is true form the target corpus
    * @return (idCol, langCol…carried, logw_q, n_toks, target_like) —
    *         target_like ⟺ logw_q > 0, the scale-free selection rule
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, carryCols: Seq[String] = Nil,
                        buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val carry = carryCols.map(col)
    val toks = docs.select(
      (col(idCol) +: carry) ++ Seq(
        targetPred.as("__is_t"),
        explode(TextFunctions.tokens(col(textCol))).as("__term")): _*)
      .withColumn("__f", TextFunctions.portableHash(col("__term")) % buckets)
      .drop("__term")
      .transform(Materialize.once)

    // ≤ B rows: the whole model state, reused as a broadcast
    val counts = toks.groupBy("__f").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__ct"))
      .transform(Materialize.once)
    val stats = counts.agg(
      sum(col("__cr")).as("__r"), sum(col("__ct")).as("__t"))

    val bD = buckets.toDouble
    val contrib = toks
      .join(broadcast(counts), Seq("__f"))
      .crossJoin(broadcast(stats))
      .withColumn("__cq",
        floor((log(col("__ct") + lit(1.0)) - log(col("__cr") + lit(1.0)) +
          log(col("__r") + lit(bD)) - log(col("__t") + lit(bD))) * lit(1e6))
          .cast("long"))

    contrib.groupBy((col(idCol) +: carry): _*)
      .agg(sum("__cq").as("logw_q"), count(lit(1)).as("n_toks"))
      .withColumn("target_like", col("logw_q") > 0)
  }
}
