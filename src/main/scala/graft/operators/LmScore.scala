package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Bigram language-model quality scoring — the perplexity-proxy filter
  * a pretraining pipeline runs before spending GPU time on a document:
  * score every doc by the add-one-smoothed log-probability of its
  * bigrams under a model counted from the corpus itself (or any
  * reference corpus), and gate on the score.
  *
  * Scale shape: training is two map-side-combined count aggregations
  * (unigrams, bigrams); scoring is one explode + two equi-joins on the
  * count tables + one group-back — every stage keyed, nothing
  * quadratic, nothing driver-side. Bigrams come from the compiled
  * [[org.apache.spark.sql.graft.WordShingles]] projection; the context
  * word is a codegen `substring_index`, never a re-tokenize.
  *
  * Cross-engine determinism: each bigram's log-probability is an `ln`
  * of one integer ratio, quantized to `floor(lp·10⁶)` PER BIGRAM and
  * summed as exact integers — so the per-doc score is independent of
  * summation order (float sums are not), and the DuckDB oracle replays
  * it bit-for-bit.
  */
object LmScore {

  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Unigram counts (w, uc) over a corpus. Blank docs contribute
    * nothing (tokens() of blank is empty, not [""]). */
  def unigramCounts(corpus: DataFrame, textCol: String): DataFrame =
    fanOut(corpus).select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uc"))

  /** Bigram counts (bg, bc): bg = the two tokens space-joined. */
  def bigramCounts(corpus: DataFrame, textCol: String): DataFrame =
    fanOut(corpus).select(explode(wordShingles(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("bc"))

  /** Score every doc: one output row per input doc with
    * `n_bigrams` and `lp_q_sum` = Σ floor(10⁶ · ln((bc+1)/(uc_ctx+V)))
    * over its bigrams (null when the doc has no bigrams). `uni`/`bi`
    * are [[unigramCounts]]/[[bigramCounts]] frames — typically
    * persisted once per reference corpus; `vocabSize` = `uni.count()`.
    * Unseen bigrams/contexts smooth to (0+1)/(0+V). */
  def scoreQuantized(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                     vocabSize: Long, idCol: String, textCol: String): DataFrame = {
    val perBigram = fanOut(docs)
      .select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), 2)).as("bg"))
      .select(col("id"), col("bg"), substring_index(col("bg"), " ", 1).as("w"))
      .join(bi, Seq("bg"), "left")
      .join(uni, Seq("w"), "left")
      .select(col("id"),
        floor(log((coalesce(col("bc"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("uc"), lit(0L)) + vocabSize).cast("double")) * 1e6)
          .cast("long").as("lp_q"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_q").as("lp_q_sum"))
    docs.select(col(idCol).as("id"))
      .join(perBigram, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lp_q_sum"))
  }
}
