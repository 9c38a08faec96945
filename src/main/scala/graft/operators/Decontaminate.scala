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

  /** SPAN-REMOVAL decontamination — instead of dropping a whole
    * document that shares n-grams with the eval corpus ([[decontaminate]]'s
    * conservative policy), cut out just the contaminated WINDOWS and
    * keep the rest: each matched n-gram position expands `window`
    * tokens on both sides, overlapping/adjacent windows merge into
    * maximal spans, and the document's surviving tokens are rejoined —
    * the practical middle ground when eval snippets are quoted inside
    * otherwise-good documents (the policy popularized by GPT-3's
    * 13-gram window scrub; public technique).
    *
    * Returns one row per train doc: (idCol, n_tokens, n_spans,
    * n_removed, clean_text) — untouched docs keep their full token
    * stream with n_spans = 0. `clean_text` is the kept tokens joined
    * with single spaces (tokenization normalizes whitespace; span
    * surgery on raw character offsets would be a different,
    * format-preserving operator).
    *
    * Scale shape: the broadcast gram probe runs on the exploded
    * positions FIRST, so only MATCHED (doc, position) rows — sparse by
    * contract — reach the span-merge window (one tiny key shuffle);
    * span lists ride back to the corpus on one doc-key join, and the
    * token filter is a per-row HOF over (token, index) with
    * O(#spans) work per token. The corpus itself is never shuffled.
    */
  def scrubSpans(train: DataFrame, test: DataFrame, idCol: String,
                 textCol: String, n: Int = 13, window: Int = 20,
                 broadcastTest: Boolean = true): DataFrame = {
    require(n >= 1 && window >= 0, "need n >= 1 and window >= 0")
    import org.apache.spark.sql.expressions.Window.partitionBy
    val matches = fanOut(train)
      .select(col(idCol),
        posexplode(wordShingles(col(textCol), n)).as(Seq("__p", "gram")))
      .join(testGrams(test, textCol, n, broadcastTest), Seq("gram"))
      .select(col(idCol), col("__p"))
    // merge-by-gap on sorted positions (the burst-collapse rule):
    // expanded windows [p−w, p+n+w) overlap iff p' − p ≤ n + 2w
    val byDoc = partitionBy(col(idCol)).orderBy(col("__p"))
    val prev = lag(col("__p"), 1).over(byDoc)
    val spans = matches
      .withColumn("__new",
        when(prev.isNull || col("__p") - prev > n + 2 * window, 1L).otherwise(0L))
      .withColumn("__g", sum(col("__new")).over(byDoc))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("__p")).as("__mn"), max(col("__p")).as("__mx"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(
          greatest(col("__mn") - window, lit(0)).as("lo"),
          (col("__mx") + n + window).as("hi"))).as("__spans"),
        count(lit(1)).as("n_spans"))
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    train.join(spans, Seq(idCol), "left")
      .withColumn("__toks", toks)
      .withColumn("__kept", when(col("__spans").isNull, col("__toks"))
        .otherwise(filter(col("__toks"), (_, i) =>
          !exists(col("__spans"),
            s => i >= s.getField("lo") && i < s.getField("hi")))))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
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
