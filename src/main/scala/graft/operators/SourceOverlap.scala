package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Cross-source contamination matrix: for every pair of corpus
  * sources (crawls, dumps, datasets), how much shingle-level content
  * they share — the corpus-level diagnostic for "are these two
  * datasets secretly the same crawl?", run before mixing sources into
  * a training corpus.
  *
  * Overlap is measured on DISTINCT word-3-shingle fingerprints per
  * source: `shared = |A ∩ B|`, plus each side's total and the
  * quantized Jaccard `|A∩B| / |A∪B|`.
  *
  * 100 TB shape: text never travels — documents collapse to (source,
  * shingle-fingerprint) pairs (compiled single-pass shingling, md5
  * fingerprints), deduped with one shuffle. The pair counting is a
  * self-equi-join on fingerprint: co-partitioned after the dedup
  * shuffle, output bounded by #sources² per fingerprint (sources
  * number thousands, not billions). Totals are a sources-sized
  * aggregate, broadcast back. Beware a fingerprint present in ALL
  * sources contributing S² rows — with `sources ≪ √(corpus)` this is
  * noise; for web-scale source counts, cap per-fingerprint fan-out
  * like Dedup's hot-shingle cap.
  */
object SourceOverlap {

  /** Pairwise shared-shingle counts between sources.
    *
    * @return (src_a, src_b, shared, a_sh, b_sh, jaccard_q) for every
    *         source pair sharing at least one shingle, src_a < src_b
    */
  def shingleOverlap(docs: DataFrame, groupCol: String, textCol: String,
                     k: Int = 3): DataFrame = {
    val fp = docs
      .select(col(groupCol).as("src"),
        explode(TextFunctions.wordShingles(col(textCol), k)).as("__s"))
      .select(col("src"), TextFunctions.portableHash(col("__s")).as("fp"))
      .distinct()
      .transform(Materialize.once)

    val totals = fp.groupBy("src").agg(count(lit(1)).as("t"))

    val pairs = fp.as("a")
      .join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("shared"))

    pairs
      .join(broadcast(totals.select(col("src").as("src_a"), col("t").as("a_sh"))), Seq("src_a"))
      .join(broadcast(totals.select(col("src").as("src_b"), col("t").as("b_sh"))), Seq("src_b"))
      .withColumn("jaccard_q",
        floor(col("shared").cast("double") /
          (col("a_sh") + col("b_sh") - col("shared")).cast("double") * lit(1e6))
          .cast("long"))
      .select(col("src_a"), col("src_b"), col("shared"),
        col("a_sh"), col("b_sh"), col("jaccard_q"))
  }
}
