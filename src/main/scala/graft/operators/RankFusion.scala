package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
  * merge heterogeneous retrieval rankings (lexical + dense, multiple
  * indexes) without score calibration: each system contributes
  * `1/(c + rank)` and candidates order by the sum.
  *
  * Contributions here are the INTEGER surrogate
  * `RrfScale div (c + rank)` — the same monotone curve, but fused
  * scores become exact integer sums: order-independent, tie-breaks
  * well-defined, engine-portable (the q119 oracle replays the fusion
  * bit-for-bit).
  *
  * 100 TB shape: rankings are per-query top-k lists — tiny relative
  * to the corpora that produced them. The fusion is a full-outer
  * equi-join on (query, doc) plus a per-query window; both shuffle
  * only ranked candidates, never corpus rows.
  */
object RankFusion {
  val RrfScale = 1000000000L

  /** Fuse two rankings sharing (keyCols, idCol, rankCol).
    *
    * @return keyCols ++ (rank, idCol, rrf_q, rank_a, rank_b); rank_a /
    *         rank_b null where a system did not retrieve the doc
    */
  def rrf2(a: DataFrame, b: DataFrame, keyCols: Seq[String], idCol: String,
           rankCol: String = "rank", c: Int = 60, topK: Int = 10): DataFrame = {
    require(c >= 0 && topK >= 1)
    val ka = a.select((keyCols :+ idCol).map(col) :+ col(rankCol).as("rank_a"): _*)
    val kb = b.select((keyCols :+ idCol).map(col) :+ col(rankCol).as("rank_b"): _*)
    ka.join(kb, keyCols :+ idCol, "full_outer")
      .withColumn("rrf_q",
        coalesce(expr(s"$RrfScale div ($c + rank_a)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($c + rank_b)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("rrf_q").desc, col(idCol))))
      .filter(col("rank") <= topK)
      .select(keyCols.map(col) ++ Seq(col("rank"), col(idCol),
        col("rrf_q"), col("rank_a"), col("rank_b")): _*)
  }
}
