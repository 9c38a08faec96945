package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs set-similarity join with PREFIX FILTERING — the
  * AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al.,
  * WWW'08), the standard way to make an exact Jaccard join survive web
  * scale. The reference's dedup story stops at MinHash
  * (approximate); this operator is the exact complement for the
  * "no false negatives allowed" tier of a curation pipeline.
  *
  * Difference from [[Dedup.ngramJaccardDuplicates]] (inverted-index
  * count join): that operator posts EVERY element of every set, so the
  * index and the candidate join scale with total corpus volume and hot
  * tokens fan out quadratically. Here each set of size l posts only
  * its `l − ⌈θ·l⌉ + 1` globally-RAREST tokens (prefix under a global
  * ascending document-frequency order), which for θ = 0.6 is 40% of
  * the volume — and because prefixes are biased to rare tokens, the
  * per-token fan-out collapses: stopword-sized posting lists never
  * enter the candidate join at all. The positional upper bound prunes
  * further: a candidate surviving the token match is dropped when even
  * a perfect suffix overlap could not reach the equivalent-overlap
  * threshold α = ⌈θ/(1+θ)·(|a|+|b|)⌉.
  *
  * Exactness: if J(a,b) ≥ θ then |a∩b| ≥ α ≥ 1 and under ANY common
  * total token order the two prefixes must share an element (else the
  * overlap is bounded by min(l − p) < α) — so candidate generation has
  * no false negatives, and the verify stage computes true Jaccard over
  * the full sets. All thresholds are exact integer arithmetic on ppm
  * longs (no float boundary).
  *
  * Scale shape: one token-keyed shuffle to attach document
  * frequencies, one doc-keyed shuffle to rebuild frequency-sorted
  * arrays, the prefix self-join (shuffle on prefix token — 40% of
  * corpus volume, rare-token biased), one distinct on surviving pairs,
  * two hash joins back to the doc table for verification. Nothing is
  * ever quadratic in the corpus; candidate volume scales with true
  * near-duplicate density.
  */
object SetSimJoin {

  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** All pairs (id_a < id_b) of docs whose DISTINCT-token Jaccard
    * similarity reaches `thresholdPpm`/10⁶.
    *
    * @param docs      input; `tokensCol` is array<string> (need not be
    *                  distinct — deduped here)
    * @return (id_a, id_b, inter, uni, jac_ppm) — exact counts, Jaccard
    *         floored to ppm
    */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, tokensCol: String,
                        thresholdPpm: Long): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be in (0, 10^6], got $thresholdPpm")
    val M = 1000000L
    val base = fanOut(docs).select(col(idCol).cast("long").as("id"),
        array_distinct(col(tokensCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    // Global rarest-first token order: sort key is the (df, token)
    // PAIR, so no dense-rank window over the vocabulary is needed —
    // the order is attached by a plain token-keyed join and realized
    // by per-doc sort_array. Ties (equal df) break by token string:
    // total, deterministic, identical on every engine.
    val tokenDf = base.select(col("id"), explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val sorted = Materialize.once( // read by prefix postings + 2 verify joins
      base.select(col("id"), explode(col("toks")).as("token"))
        .join(tokenDf, Seq("token"))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("st"))
        .select(col("id"),
          expr("transform(st, x -> x.token)").as("toks"),
          size(col("st")).cast("long").as("len")))
    // prefix length p = l − ⌈θl⌉ + 1 (exact ppm ceiling)
    val prefixes = sorted.select(col("id"), col("len"),
        posexplode(expr(
          s"slice(toks, 1, CAST(len - ((len * $thresholdPpm + ${M - 1}) div $M) + 1 AS INT))")))
      .toDF("id", "len", "pos", "token")
    // equivalent-overlap threshold α = ⌈θ(la+lb)/(1+θ)⌉; a shared
    // prefix token at 0-based positions (pa, pb) can anchor an overlap
    // of at most min(la − pa, lb − pb)
    val candidates = prefixes.as("a").join(prefixes.as("b"),
        col("a.token") === col("b.token") && col("a.id") < col("b.id") &&
        col("a.len") * M >= lit(thresholdPpm) * col("b.len") &&
        col("b.len") * M >= lit(thresholdPpm) * col("a.len") &&
        least(col("a.len") - col("a.pos"), col("b.len") - col("b.pos")) * (M + thresholdPpm)
          >= lit(thresholdPpm) * (col("a.len") + col("b.len")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sorted.select(col("id").as("id_a"), col("toks").as("ta"),
        col("len").as("la")), Seq("id_a"))
      .join(sorted.select(col("id").as("id_b"), col("toks").as("tb"),
        col("len").as("lb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", col("la") + col("lb") - col("inter"))
      .filter(col("inter") * M >= lit(thresholdPpm) * col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        expr(s"(inter * $M) div uni").as("jac_ppm"))
  }
}
