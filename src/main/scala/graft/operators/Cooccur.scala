package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Token co-occurrence statistics with PMI scoring — the counting
  * pass behind word2vec/GloVe-style embedding training data and
  * collocation mining.
  *
  * A pair is an ORDERED (w1, w2) with w2 at distance 1..window after
  * w1 in the same document. PMI uses the pair table's own marginals:
  * {{{
  *   pmi(a,b) = ln(c_ab) - ln(c_a·) - ln(c_·b) + ln(N)
  * }}}
  * (subtraction form: no count products, so no BIGINT overflow at any
  * corpus size), emitted floor-quantized to 10⁻⁶.
  *
  * 100 TB shape: pairs are generated ARRAY-SIDE — a per-row
  * `transform`+`slice`+`flatten` over the token array and ONE explode;
  * no positions self-join, so the only wide exchange is the
  * (w1, w2) count shuffle (map-side combined). Marginals are
  * vocabulary-sized aggregates of the pair counts, broadcast back.
  * Top-k is `orderBy.limit` → TakeOrderedAndProject (per-partition
  * heaps + driver merge, never a global sort).
  */
object Cooccur {

  /** Top-k co-occurring pairs by count, with quantized PMI.
    *
    * @param window max forward distance (1..window) for a pair
    * @return (w1, w2, cab, ca, cb, pmi_q) ordered by
    *         (cab desc, w1, w2), limited to topK
    */
  def pmiPairs(docs: DataFrame, textCol: String,
               window: Int = 2, topK: Int = 50): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val pairs = docs
      .select(TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(explode(flatten(expr(
        s"transform(__ts, (x, i) -> transform(slice(__ts, i + 2, $window), y -> struct(x AS w1, y AS w2)))")))
        .as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))

    val cab = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
      .transform(Materialize.once)
    val ca = cab.groupBy("w1").agg(sum("cab").as("ca"))
    val cb = cab.groupBy("w2").agg(sum("cab").as("cb"))
    val n = cab.agg(sum("cab").as("n"))

    cab.join(broadcast(ca), Seq("w1"))
      .join(broadcast(cb), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_q",
        floor((log(col("cab").cast("double")) - log(col("ca").cast("double")) -
          log(col("cb").cast("double")) + log(col("n").cast("double"))) * lit(1e6))
          .cast("long"))
      .select(col("w1"), col("w2"), col("cab"), col("ca"), col("cb"), col("pmi_q"))
      .orderBy(col("cab").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
