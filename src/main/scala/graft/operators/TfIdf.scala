package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** TF-IDF weighting (SURVEY §7.6 "text analysis: tokenize/tf-idf").
  *
  * Two paths:
  *  - [[termWeights]]: exact DataFrame-native tf·idf over the token
  *    vocabulary — three codegen'd aggregations (tf per (doc, term),
  *    df per term, N), one broadcast of the tiny df table. Weights use
  *    the smoothed idf `ln((N+1)/(df+1)) + 1`. Scales as
  *    explode+groupBy, the same shape as the MinHash signatures.
  *  - [[mllibPipeline]]: the MLlib Tokenizer → HashingTF → IDF pipeline
  *    producing fixed-width feature vectors for downstream ML — reuse
  *    over reimplementation where Spark already ships the operator.
  *
  * Note: `ln` differs across engines in the last ulp, so tf-idf scores
  * are not DuckDB-oracle-comparable; correctness is covered by
  * TfIdfSpec against independently computed values.
  */
object TfIdf {

  /** Per-(doc, term) tf-idf weights, with per-doc rank.
    *
    * EAGER: runs Spark jobs at call time (the tf checkpoint and the
    * doc-count scalar) in the default [[Materialize]] mode. */
  def termWeights(df: DataFrame, idCol: String, textCol: String,
                  topK: Int = 0): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // tf feeds BOTH the df aggregation and the weight join — without
    // materialization the tokenize+count pass over the corpus runs twice
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .transform(Materialize.once)
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N counts ALL input docs (token-less docs too — they shape the
    // smoothed idf), so it must scan the input, not tf
    val n = df.select(col(idCol)).distinct().count()
    val weighted = tf.join(broadcast(docFreq), Seq("term"))
      .withColumn("idf",
        log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)
      .withColumn("tf_idf", col("tf") * col("idf"))
    val ranked = weighted.withColumn("rank",
      row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("tf_idf").desc, col("term"))))
    val out = if (topK > 0) ranked.filter(col("rank") <= topK) else ranked
    out.select(col("id"), col("term"), col("tf"), col("df"),
      col("tf_idf"), col("rank"))
  }

  /** MLlib Tokenizer → HashingTF → IDF; returns the input plus a
    * `features` vector column (and the fitted model for reuse). */
  def mllibPipeline(df: DataFrame, textCol: String, numFeatures: Int = 1 << 14)
      : (DataFrame, org.apache.spark.ml.PipelineModel) = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
    val pipeline = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("__tokens"),
      new HashingTF().setInputCol("__tokens").setOutputCol("__tf")
        .setNumFeatures(numFeatures),
      new IDF().setInputCol("__tf").setOutputCol("features")))
    val model = pipeline.fit(df)
    (model.transform(df).drop("__tokens", "__tf"), model)
  }
}
