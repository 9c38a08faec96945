package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998):
  * greedily pick k items maximizing
  * `λ·rel(item, query) − (1−λ)·max_{s∈selected} sim(item, s)` —
  * the de-dup/diversity re-rank between retrieval and a context
  * window, and the coreset picker for "diverse exemplars from this
  * cluster" curation.
  *
  * Determinism: similarity is the exact integer dot product over
  * `floor(x·10⁶)` quantized vectors, λ is an integer percent, the
  * score is `λ·rel − (100−λ)·maxSim` in longs, and every greedy step
  * breaks score ties by item id — so the selected set is a pure
  * function of the inputs and the DuckDB oracle replays it move for
  * move ([[mmrOracleSql]]).
  *
  * Scale shape: the greedy loop is CONTROL-PLANE by design — k
  * distributed TakeOrdered(1) passes over the candidate frame, each a
  * shuffle-free projection (relevance precomputed once; the selected
  * set rides along as ≤ k vector literals, k ≤ 64 by contract). The
  * candidate frame itself never moves. For corpus-scale k, this is
  * the wrong operator — use clustering ([[KMeansInt]]) and take per-
  * cell exemplars instead; MMR's sequential dependency is inherent.
  */
object Mmr {

  /** Greedy MMR top-k. Returns `(rank, id, relevance, max_sim_selected,
    * mmr_score)` in selection order. EAGER: runs k small jobs now.
    *
    * @param lambdaPct relevance weight λ as an integer percent (0..100)
    */
  def selectTopK(candidates: DataFrame, idCol: String, vecCol: String,
                 queryVec: Array[Long], k: Int, lambdaPct: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k (see scaladoc)")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"lambdaPct out of [0,100]: $lambdaPct")
    val spark = candidates.sparkSession

    val qLit = array(queryVec.map(lit): _*)
    val base = Materialize.once(candidates.select(
      col(idCol).cast("long").as("id"),
      VectorFunctions.quantize(col(vecCol)).as("qv"))
      .withColumn("rel", VectorFunctions.intDot(col("qv"), qLit)))

    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val selIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (_ <- 1 to k) {
      val selDots = selVecs.toSeq.map(v =>
        VectorFunctions.intDot(col("qv"), array(v.map(lit): _*)))
      val maxSim = selDots match {
        case Seq() => lit(0L)
        case Seq(one) => one // greatest() needs >= 2 args
        case many => greatest(many: _*)
      }
      val remaining =
        if (selIds.isEmpty) base else base.filter(!col("id").isin(selIds.toSeq: _*))
      val top = remaining
        .withColumn("ms", maxSim)
        .withColumn("score",
          lit(lambdaPct.toLong) * col("rel") - lit((100 - lambdaPct).toLong) * col("ms"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(1)
        .select("id", "rel", "ms", "score", "qv")
        .head()
      picked += ((top.getLong(0), top.getLong(1), top.getLong(2), top.getLong(3)))
      selIds += top.getLong(0)
      selVecs += top.getSeq[Long](4).toArray
    }
    base.unpersist()

    val rows = picked.zipWithIndex.map { case ((id, rel, ms, sc), i) =>
      Row((i + 1).toLong, id, rel, ms, sc)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("relevance", LongType, nullable = false),
        StructField("max_sim_selected", LongType, nullable = false),
        StructField("mmr_score", LongType, nullable = false))))
  }

  /** DuckDB replica: k chained argmax CTEs over the same integer
    * arithmetic. `baseSql` must yield (id BIGINT, qv BIGINT[]) and
    * `querySql` one row (qv BIGINT[]). */
  def mmrOracleSql(baseSql: String, querySql: String, k: Int,
                   lambdaPct: Int): String = {
    def dot(a: String, b: String) =
      s"CAST(list_sum([$a[i] * $b[i] for i in range(1, len($a) + 1)]) AS BIGINT)"
    val lam = lambdaPct
    val unlam = 100 - lambdaPct
    val steps = (1 to k).map { i =>
      if (i == 1)
        s"""s1 AS (SELECT id, qv, rel, CAST(0 AS BIGINT) AS ms,
           |  $lam * rel AS score
           |  FROM base ORDER BY score DESC, id ASC LIMIT 1)""".stripMargin
      else {
        val prev = (1 to i - 1).map(j => s"s$j").toSeq
        val notIn = prev.map(p => s"b.id <> $p.id").mkString(" AND ")
        val sims = prev.map(p => dot("b.qv", s"$p.qv")).mkString(", ")
        val ms = if (i == 2) sims else s"greatest($sims)"
        s"""s$i AS (SELECT b.id, b.qv, b.rel, $ms AS ms,
           |  $lam * b.rel - $unlam * ($ms) AS score
           |  FROM base b, ${prev.mkString(", ")}
           |  WHERE $notIn
           |  ORDER BY score DESC, b.id ASC LIMIT 1)""".stripMargin
      }
    }.mkString(",\n")
    val out = (1 to k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, id, rel AS relevance,
         |  ms AS max_sim_selected, score AS mmr_score FROM s$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cand AS ($baseSql),
       |q AS ($querySql),
       |base AS (SELECT cand.id, cand.qv, ${dot("cand.qv", "q.qv")} AS rel
       |         FROM cand, q),
       |$steps
       |SELECT * FROM ($out) ORDER BY rank""".stripMargin
  }
}
