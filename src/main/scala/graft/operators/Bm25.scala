package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Okapi BM25 retrieval over a document corpus — the standard
  * relevance ranking for sparse (lexical) search, the retrieval half
  * of a RAG / hard-negative-mining pipeline (the dense half is
  * [[Similarity]]).
  *
  * Score of document D for query Q:
  * {{{
  *   sum over q in Q of  idf(q) * tf(q,D)*(k1+1) / (tf(q,D) + k1*(1 - b + b*|D|/avgdl))
  *   idf(q) = ln(1 + (N - df(q) + 0.5) / (df(q) + 0.5))        (Lucene form, always > 0)
  * }}}
  *
  * 100 TB shape: the query set is tiny and DRIVER-KNOWN — per-term tf
  * is a compiled in-array count per document (no corpus token explode,
  * no per-(doc,term) shuffle at all); only matching (doc, term) hits
  * ever become rows. Corpus stats (N, Σdl) are a one-row aggregate
  * broadcast-crossed into the plan; df is computed over the hit
  * postings only (exactly the df of each query term). No global sort:
  * top-k per query is a per-query window over candidates. The
  * scan-side cost is O(|tokens| · |query terms|) comparisons inside
  * whole-stage codegen — the right trade until the term set grows
  * past a few hundred, where [[Bm25Index]]'s persistent postings
  * take over.
  *
  * Determinism contract (cross-engine oracle): each per-term
  * contribution is quantized to `floor(x·10⁶)` as a LONG and the
  * per-doc score is the exact integer sum of contributions — so the
  * ranking never depends on float summation order. Both engines
  * evaluate the same literal constants: callers of the SQL twin must
  * interpolate `Double.toString(k1+1)` etc. so the parsed doubles are
  * bit-identical (see TextQueries.bm25 oracle).
  */
object Bm25 {

  /** CPU-heavy scans must not inherit the input's split count — a
    * single small parquet file reads as one partition and serializes
    * the tokenize pass on one core (the Dedup.fanOut discipline). */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Top-k docs per query by quantized BM25 score.
    *
    * @param queries (qid, query text) pairs; terms tokenized with the
    *                corpus tokenizer, duplicates within a query ignored
    * @return (qid, rank, doc_id, score_q) — rank 1..k by
    *         (score_q desc, doc_id asc)
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(Int, String)], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queryTerms(docs.sparkSession, queries)
    val corpus = fanOut(docs)

    // one-row corpus stats (N docs, total token count) — broadcast-crossed
    val stats = corpus.agg(
      count(lit(1)).as("n"),
      sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("sumdl"))

    // the query terms are DRIVER-KNOWN and tiny, so per-term tf comes
    // from ONE compiled pass per document (TokenTermCounts: tokenize
    // once, bucket tokens through the constant term map). The corpus
    // token stream is never exploded and the per-(doc, term) groupBy
    // shuffle disappears entirely; the only remaining exchanges are
    // term-sized (df) and candidate-sized (per-query totals).
    // Driver-side tokenization goes through THE corpus tokenizer
    // contract (TextCodec.tokenize: U+0020-only trim, \s+ split with
    // limit -1) — java.lang.String.trim would diverge on tab/newline
    // -adjacent whitespace. Leading "" tokens (non-space leading
    // whitespace) are dropped on BOTH sides: here and in queryTerms.
    val terms: Seq[String] = driverTerms(queries)
    if (terms.isEmpty)
      return scoreAndRank(
        docs.select(col(idCol).as("doc_id"), lit(0L).as("dl"),
          lit("").as("term"), lit(0L).as("tf")).limit(0),
        qTerms, stats, k, k1, b)

    val termArr = array(terms.map(lit): _*)
    val tf = corpus
      .select(col(idCol).as("doc_id"),
        org.apache.spark.sql.graft.TokenTermCounts(col(textCol), terms).as("__tc"))
      .select(col("doc_id"),
        element_at(col("__tc"), terms.length + 1).as("dl"),
        posexplode(slice(col("__tc"), 1, terms.length)))
      .filter(col("col") > 0)
      .select(col("doc_id"), col("dl"),
        element_at(termArr, col("pos") + 1).as("term"), col("col").as("tf"))
    scoreAndRank(tf, qTerms, stats, k, k1, b)
  }

  /** The distinct driver-known term list, tokenized through THE corpus
    * tokenizer contract (TextCodec.tokenize: U+0020-only trim, \s+
    * split, limit -1) — java.lang.String.trim would diverge on
    * tab/newline-adjacent whitespace. The "" token non-space leading
    * whitespace produces is dropped, mirroring [[queryTerms]]. */
  private[operators] def driverTerms(queries: Seq[(Int, String)]): Seq[String] =
    queries.flatMap { case (_, q) =>
      org.apache.spark.sql.graft.TextCodec.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(q))
    }.filter(_.nonEmpty).distinct

  /** The query set as (qid, term) rows — tokenized with the corpus
    * tokenizer, per-query duplicates dropped. The "" token a
    * non-space-leading-whitespace query would produce is filtered here
    * to mirror the driver-side term list (the tf scan never emits tf
    * rows for ""). */
  private[operators] def queryTerms(spark: org.apache.spark.sql.SparkSession,
                                    queries: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    queries.toDF("qid", "qtext")
      .select(col("qid"),
        explode(array_distinct(TextFunctions.tokens(col("qtext")))).as("term"))
      .filter(col("term") =!= "")
  }

  /** The shared scoring tail: df from the (already query-filtered)
    * postings, quantized per-term contributions, exact integer per-doc
    * sums, per-query top-k. `tf` = (doc_id, dl, term, tf); `stats` =
    * one row (n, sumdl). Used by both the scan path ([[topK]]) and the
    * persistent-index path ([[Bm25Index.search]]). */
  private[operators] def scoreAndRank(tf: DataFrame, qTerms: DataFrame,
                                      stats: DataFrame, k: Int,
                                      k1: Double, b: Double): DataFrame = {
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sumdl").cast("double") / col("n").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        floor(col("idf") * (col("tf") * lit(k1p1)) /
          (col("tf") + lit(k1) * (lit(oneMinusB) + (lit(b) * col("dl")) / col("avgdl"))) *
          lit(1e6)).cast("long"))

    val total = contrib.join(broadcast(qTerms), Seq("term"))
      .groupBy("qid", "doc_id").agg(sum("contrib").as("score_q"))

    total
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score_q").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_q"))
  }
}
