package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus drift detection: Population Stability Index between two
  * snapshots of a text corpus over hashed token buckets — the
  * monitoring pass a production data pipeline runs before retraining
  * ("did this month's crawl change distribution?"). PSI is the
  * industry-standard drift score: Σ over buckets of
  * `(p_base − p_cur) · ln(p_base / p_cur)`; < 0.1 stable, > 0.25
  * action. Same hashed-bag machinery as [[Dsir]], pointed at
  * monitoring instead of selection.
  *
  * Per-bucket contributions use add-one smoothing (no empty-bucket
  * infinities) and are emitted floor-quantized to 10⁻⁹ — per-bucket
  * rows are exact integers, so the corpus-level score (their sum) is
  * order-independent and engine-portable.
  *
  * 100 TB shape: one pass over the UNION of both snapshots (side tag
  * rides the scan), one ≤`buckets`-row count shuffle, totals
  * broadcast-crossed back. Nothing corpus-sized ever joins.
  */
object Drift {

  /** Per-bucket PSI contributions between two snapshots.
    *
    * @return (bucket, c_base, c_cur, psi_q) for every bucket observed
    *         on either side, ordered by bucket; the corpus PSI is
    *         sum(psi_q)/10⁹
    */
  def psiByBucket(base: DataFrame, current: DataFrame, textCol: String,
                  buckets: Int = 256): DataFrame = {
    require(buckets > 0)
    val side = (df: DataFrame, tag: Int) => df.select(
      lit(tag).as("__side"),
      explode(TextFunctions.tokens(col(textCol))).as("__term"))
    val toks = side(base, 0).unionByName(side(current, 1))
      .withColumn("__f", TextFunctions.portableHash(col("__term")) % buckets)

    val counts = toks.groupBy("__f").agg(
      sum(when(col("__side") === 0, 1L).otherwise(0L)).as("c_base"),
      sum(when(col("__side") === 1, 1L).otherwise(0L)).as("c_cur"))
      .transform(Materialize.once) // feeds totals AND the projection
    val totals = counts.agg(
      sum(col("c_base")).as("tb"), sum(col("c_cur")).as("tc"))

    val bD = buckets.toDouble
    counts.crossJoin(broadcast(totals))
      .withColumn("__pb",
        (col("c_base") + lit(1.0)) / (col("tb") + lit(bD)))
      .withColumn("__pc",
        (col("c_cur") + lit(1.0)) / (col("tc") + lit(bD)))
      .withColumn("psi_q",
        floor((col("__pb") - col("__pc")) * log(col("__pb") / col("__pc")) *
          lit(1e9)).cast("long"))
      .select(col("__f").as("bucket"), col("c_base"), col("c_cur"),
        col("psi_q"))
      .orderBy("bucket")
  }
}
