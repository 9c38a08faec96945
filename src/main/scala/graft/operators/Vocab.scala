package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Corpus vocabulary construction and out-of-vocabulary statistics —
  * the tokenizer-adjacent bookkeeping of a training-data pipeline
  * (vocab coverage gates, OOV-rate quality filters, id assignment for
  * downstream packing).
  *
  * Scale shape: frequency counting is one explode + map-side-combined
  * groupBy shuffle on the token; top-V selection is a distributed
  * `TakeOrderedAndProject` (never a global sort of the full token
  * universe); only the V winning rows pass through the id-assigning
  * window. The OOV probe broadcasts the (V-sized) vocabulary, so the
  * corpus is never shuffled for membership — only the per-doc count
  * aggregation shuffles, keyed on the doc id.
  */
object Vocab {

  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Top-`size` tokens by corpus frequency (ties broken
    * lexicographically), with dense rank ids 0..size-1 in that order:
    * (token, freq, token_id). The id window runs over only the `size`
    * surviving rows — vocabulary-sized, not corpus-sized. */
  def build(df: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"vocab size must be positive, got $size")
    fanOut(df)
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(size)
      .withColumn("token_id",
        (row_number().over(Window.orderBy(col("freq").desc, col("token")))
          - 1).cast("long"))
  }

  /** Per-document token and OOV counts against a vocabulary (any
    * DataFrame with a `token` column, e.g. [[build]]'s output):
    * (idCol, n_tokens, n_oov). Documents with no tokens (blank text)
    * report 0/0 rather than disappearing. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val stats = fanOut(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_oov"))
  }
}
