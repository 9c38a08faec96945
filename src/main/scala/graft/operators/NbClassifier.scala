package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic integer multinomial Naive Bayes over hashed unigram
  * buckets — the lightweight supervised scorer a curation pipeline
  * reaches for once heuristics ([[QualityOps.gopherFlags]]) and
  * unsupervised perplexity ([[LmScore]]) run out: train exact
  * per-class token counts, score with add-one-smoothed log
  * probabilities. Unlike an SGD-trained classifier, every number here
  * is a closed form of exact counts, so the whole model AND every
  * score replay oracle-side (the reference keeps its analytics
  * oracle-checkable the same way; cf. vivek-neenopal/shopify-etl
  * sql/ merge checks).
  *
  * Scoring math (all per-token work quantized to floor(x·10⁶) LONGs
  * BEFORE any sum — the [[Dsir]] portability pattern):
  * {{{
  *   lq(f, c)  = ⌊(ln(cnt[c][f] + 1) − ln(tot[c] + B)) · 10⁶⌋
  *   prior(c)  = ⌊(ln(nd[c]) − ln(nd_total)) · 10⁶⌋
  *   score(D,c)= prior(c) + Σ_f tf(D, f) · lq(f, c)
  *   pred(D)   = argmax_c score(D, c)   (tie → smaller class string)
  * }}}
  * Hashing tokens into B buckets (the vocabulary hashing trick) bounds
  * the model at C·B rows regardless of corpus vocabulary, so the DENSE
  * model — zero-count buckets included, which is what makes the
  * smoothing term uniform and the scoring join total — stays
  * broadcast-sized.
  *
  * 100 TB shape: two token-stream shuffles (class-bucket counts at
  * train, (doc, bucket) tf at score), one (doc, class) aggregation
  * fanning the tf stream C-fold against the broadcast model, then a
  * map-side-combined argmax per doc. Class list + priors are C
  * control-plane rows, collected once (EAGER — a Spark job runs at
  * call time). Multiplying tf by the quantized lq is exact: per-bucket
  * tf·⌊lq⌋ ≡ summing ⌊lq⌋ per token occurrence.
  *
  * Magnitude contract: |lq| ≤ 10⁶·ln(tot+B) < 3·10⁷ for any corpus
  * below 10¹² training tokens, so a doc needs > 10¹¹ tokens to
  * overflow the LONG score — far past any real document.
  */
object NbClassifier {

  /** Train on `train` (labelCol = class), score every row of
    * `toScore`. Token-less docs get the best-prior class.
    *
    * @return (idCol, pred, score_q) — score_q is the winning class's
    *         quantized log-posterior (comparable within a doc only)
    */
  def trainScore(train: DataFrame, toScore: DataFrame, idCol: String,
                 textCol: String, labelCol: String,
                 buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val spark = train.sparkSession
    import spark.implicits._

    val trTok = train.select(col(labelCol).cast("string").as("__cls"),
        explode(TextFunctions.tokens(col(textCol))).as("__term"))
      .where(col("__cls").isNotNull)
      .withColumn("__f", TextFunctions.portableHash(col("__term")) % buckets)
      .drop("__term")
    val cnt = trTok.groupBy("__cls", "__f").agg(count(lit(1)).as("__c"))
    val tot = trTok.groupBy("__cls").agg(count(lit(1)).as("__tc"))

    // control-plane: the class list and doc priors are C rows
    val classRows = train
      .groupBy(col(labelCol).cast("string").as("__cls"))
      .agg(count(lit(1)).as("__nd"))
      .where(col("__cls").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(classRows.nonEmpty, "NbClassifier: no labelled training rows")
    require(classRows.length * buckets <= 50000000,
      s"NbClassifier: ${classRows.length} classes x $buckets buckets " +
        "exceeds the broadcast-model budget; shrink one of them")
    val ndTot = classRows.map(_._2).sum
    def q(x: Double): Long = math.floor(x * 1e6).toLong
    val priorRows = classRows.map { case (c, nd) =>
      (c, q(math.log(nd.toDouble) - math.log(ndTot.toDouble)))
    }
    // token-less docs score prior-only: best prior, tie → smaller class
    val default = priorRows.minBy { case (c, p) => (-p, c) }

    // dense C×B model: skeleton ⟕ observed counts, broadcast
    val skeleton = classRows.map(_._1).toSeq.toDF("__cls")
      .crossJoin(spark.range(buckets.toLong).select(col("id").as("__f")))
    val model = skeleton
      .join(cnt, Seq("__cls", "__f"), "left")
      .join(tot, Seq("__cls"))
      .select(col("__cls"), col("__f"),
        floor((log(coalesce(col("__c"), lit(0L)) + lit(1.0)) -
          log(col("__tc") + lit(buckets.toDouble))) * lit(1e6))
          .cast("long").as("__lq"))

    val tf = toScore.select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("__term"))
      .withColumn("__f", TextFunctions.portableHash(col("__term")) % buckets)
      .groupBy("__id", "__f").agg(count(lit(1)).as("__tf"))

    val priors = priorRows.toSeq.toDF("__cls", "__pq")
    val perCls = tf.join(broadcast(model), Seq("__f"))
      .groupBy("__id", "__cls")
      .agg(sum(col("__tf") * col("__lq")).as("__s"))
      .join(broadcast(priors), Seq("__cls"))
      .select(col("__id"), col("__cls"), (col("__s") + col("__pq")).as("__score"))

    // argmax with total tie-break: min over (−score, class) — field-
    // by-field struct order gives highest score, then smallest class
    val best = perCls.groupBy("__id")
      .agg(min(struct((-col("__score")).as("n"), col("__cls").as("c"),
        col("__score").as("s"))).as("__b"))
      .select(col("__id"), col("__b.c").as("pred"), col("__b.s").as("score_q"))

    toScore.select(col(idCol).as("__id")).join(best, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("pred"), lit(default._1)).as("pred"),
        coalesce(col("score_q"), lit(default._2)).as("score_q"))
  }
}
