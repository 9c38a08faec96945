package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.wordShingles

/** Train/test decontamination: remove (or report) training documents
  * that share word n-grams with an evaluation corpus — the step that
  * keeps benchmark answers out of a training set.
  *
  * Scale shape: the test corpus is a benchmark suite — small by
  * contract — so its distinct n-gram set is BROADCAST and the training
  * corpus is never shuffled for the membership probe; only the matched
  * (doc, gram) rows shuffle for the per-doc count. With
  * `broadcastTest = false` (a huge holdout corpus) the probe degrades
  * to a plain shuffle join keyed on the gram. n-grams stay strings
  * end-to-end here for oracle-checkability; at extreme scale hash the
  * gram first (`portableHash`) to shrink the broadcast and the
  * shuffle keys.
  */
object Decontaminate {

  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Distinct n-gram set of the evaluation corpus. */
  private def testGrams(test: DataFrame, textCol: String, n: Int,
                        broadcastTest: Boolean): DataFrame = {
    val g = fanOut(test)
      .select(explode(wordShingles(col(textCol), n)).as("gram")).distinct()
    if (broadcastTest) broadcast(g) else g
  }

  /** Per-train-doc contamination report: (idCol, n_shared) where
    * `n_shared` counts DISTINCT n-grams the doc shares with the test
    * corpus; clean docs are absent. The broadcast probe runs FIRST and
    * the (doc, gram) dedup only on the matched survivors — deduping
    * before the probe would shuffle the whole exploded corpus, the
    * exact cost this operator exists to avoid. */
  def overlapReport(train: DataFrame, test: DataFrame, idCol: String,
                    textCol: String, n: Int = 8,
                    broadcastTest: Boolean = true): DataFrame =
    fanOut(train)
      .select(col(idCol), explode(wordShingles(col(textCol), n)).as("gram"))
      .join(testGrams(test, textCol, n, broadcastTest), Seq("gram"))
      .distinct() // matched rows only — tiny next to the corpus
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))

  /** The training corpus with every contaminated document removed
    * (any shared n-gram disqualifies — the conservative policy). */
  def decontaminate(train: DataFrame, test: DataFrame, idCol: String,
                    textCol: String, n: Int = 8,
                    broadcastTest: Boolean = true): DataFrame = {
    val contaminated = fanOut(train)
      .select(col(idCol), explode(wordShingles(col(textCol), n)).as("gram"))
      .join(testGrams(test, textCol, n, broadcastTest), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** FUZZY contamination — near-duplicate pairs BETWEEN corpora
    * (train × test), the MinHash-LSH sibling of the exact n-gram probe:
    * catches test documents that were lightly edited before landing in
    * the training set, which share most-but-not-all n-grams and can
    * slip under an exact-overlap threshold. Returns
    * (train_id, test_id, jaccard) for pairs with exact shingle-set
    * Jaccard ≥ `threshold` among LSH band-collision candidates — the
    * same signature/band/verify contract as `Dedup.minhashDuplicates`,
    * but joined across corpora instead of self-joined.
    *
    * Scale shape: each corpus is shingled ONCE; band keys are a
    * compiled zero-shuffle projection; the (small by contract) test
    * side's bands and shingle sets are broadcast, so the train corpus
    * is never shuffled — candidates and their verify rows are the only
    * moving data. `broadcastTest = false` degrades to shuffle joins for
    * a holdout corpus too large to broadcast.
    *
    * EAGER: checkpointing each corpus's shingle sets runs Spark jobs
    * at call time in the default [[Materialize]] mode;
    * `spark.graft.localCheckpoint=false` defers to lazy persist. */
  def nearDuplicateReport(train: DataFrame, test: DataFrame, idCol: String,
                          textCol: String, threshold: Double,
                          shingleSize: Int = 3, bands: Int = 8,
                          rowsPerBand: Int = 2,
                          broadcastTest: Boolean = true): DataFrame = {
    def bc(df: DataFrame): DataFrame = if (broadcastTest) broadcast(df) else df
    val shTrain = Materialize.once(
      Dedup.shingleSets(train, idCol, textCol, shingleSize))
    val shTest = Materialize.once(
      Dedup.shingleSets(test, idCol, textCol, shingleSize))
    val cands = Dedup.bandedKeys(shTrain, bands, rowsPerBand)
      .join(bc(Dedup.bandedKeys(shTest, bands, rowsPerBand)
        .withColumnRenamed("id", "test_id")), Seq("band", "key"))
      .select(col("id").as("train_id"), col("test_id"))
      .distinct()
    cands
      .join(shTrain.select(col("id").as("train_id"), col("sh").as("sh_a")),
        Seq("train_id"))
      .join(bc(shTest.select(col("id").as("test_id"), col("sh").as("sh_b"))),
        Seq("test_id"))
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("train_id"), col("test_id"), col("jaccard"))
  }

  /** SUBSTRING-level contamination — exact verbatim-span detection, the
    * stricter sibling of the word-n-gram probe (catches spans that
    * tokenization would split differently, e.g. punctuation-fused
    * benchmark answers). Returns (idCol, span_id) for every document
    * containing `spans(span_id)` as a raw substring.
    *
    * The span set rides along as a constant inside one compiled
    * Rabin–Karp pass (o.a.s.sql.graft.MultiPatternMatch): the corpus
    * is scanned once with zero shuffle and per-row cost
    * O(|text| · distinct-span-lengths), not O(|text| · spans) — the
    * shape that survives a benchmark suite of thousands of spans. Spans
    * are driver-side by contract (an eval suite, not a corpus); empty
    * spans are rejected by the expression. */
  def substringMatches(train: DataFrame, idCol: String, textCol: String,
                       spans: Seq[(Long, String)]): DataFrame = {
    require(spans.nonEmpty, "need at least one span")
    val ids = spans.map(_._1).toArray
    fanOut(train)
      .select(col(idCol),
        explode(org.apache.spark.sql.graft.MultiPatternMatch(
          col(textCol), spans.map(_._2))).as("__pi"))
      .select(col(idCol),
        element_at(lit(ids), col("__pi") + 1).as("span_id"))
  }
}
