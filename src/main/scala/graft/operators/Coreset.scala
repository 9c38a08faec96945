package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal) over an embedding column — the classic data-selection
  * pass for training corpora: pick k exemplars so every vector is
  * close to some pick (2-approximation of the optimal k-center cover).
  * Complements [[Mmr]] (query-relevance + diversity) with PURE
  * coverage: no query, maximal spread.
  *
  * Determinism (the [[KMeansInt]] scheme): coordinates quantize to
  * `floor(x·scale) + offset`, distances are exact integer squared-L2,
  * the seed is the smallest id, and each round picks the point
  * maximizing its distance to the chosen set (ties → lower id). No
  * RNG, no float summation order — the q223 oracle replays every round
  * bit-for-bit.
  *
  * 100 TB shape: the chosen set is CONTROL-PLANE (k vectors on the
  * driver). Each round is ONE corpus scan — per-point min distance to
  * the current picks folds inside whole-stage codegen (compiled
  * zip_with/aggregate over array literals), and the argmax is a
  * scalar struct-min aggregation (map-side partial, no shuffle of
  * data rows, no Window). Total k scans, O(n·k²·dim) arithmetic —
  * the recompute-from-literals form trades redundant integer math for
  * ZERO persisted per-row state (nothing to cache or checkpoint at
  * corpus scale; k is small by contract).
  */
object Coreset {

  /** Integer squared-L2 distance from a quantized vector column to a
    * literal quantized center. */
  private def distSq(qv: Column, center: Array[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(center.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** The k greedy picks, in pick order.
    *
    * @return (round, idCol, radius_sq): `radius_sq` is the pick's
    *         squared distance to the previously chosen set — the
    *         coverage radius of the first `round` centers (NULL for
    *         the seed row; non-increasing thereafter).
    */
  def kCenterGreedy(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                    scale: Double = 1000.0, offset: Long = 10000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vecs.sparkSession
    val q = vecs.select(col(idCol).cast("long").as("__id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale)).cast("long") + lit(offset))
        .as("__qv"))

    val seedRow = q.orderBy("__id").limit(1).collect()
    require(seedRow.nonEmpty, "kCenterGreedy: empty input")
    val seed = (seedRow.head.getLong(0), seedRow.head.getSeq[Long](1).toArray)

    val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Long])](
      (0L, seed._1, None))
    var centers = List(seed._2)
    for (r <- 1 until k) {
      val mind = centers.map(c => distSq(col("__qv"), c)).reduce(least(_, _))
      // one scan: struct-min carries (−dist, id, vector) — the argmax
      // row's payload rides along, no second fetch job
      val row = q.select(min(struct((lit(-1L) * mind).as("nd"),
        col("__id").as("id"), col("__qv").as("qv"))).as("m"))
        .selectExpr("m.nd", "m.id", "m.qv").collect().head
      val radius = -row.getLong(0)
      picks += ((r.toLong, row.getLong(1), Some(radius)))
      centers = row.getSeq[Long](2).toArray :: centers
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("radius_sq", LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(picks.toSeq.map { case (r, id, rad) =>
        Row(r, id, rad.map(Long.box).orNull)
      }, 1), schema)
  }

  /** Per-point assignment to its nearest pick (the coreset partition)
    * given the picks' quantized vectors — a shuffle-free projection.
    * @return (idCol, center_id, dist_sq) */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             centers: Seq[(Long, Array[Long])],
             scale: Double = 1000.0, offset: Long = 10000L): DataFrame = {
    require(centers.nonEmpty)
    val q = vecs.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale)).cast("long") + lit(offset))
        .as("__qv"))
    val best = centers.map { case (cid, cv) =>
      struct(distSq(col("__qv"), cv).as("d"), lit(cid).as("cid"))
    }.reduce(least(_, _))
    q.select(col(idCol), best.as("b"))
      .select(col(idCol), col("b.cid").as("center_id"),
        col("b.d").as("dist_sq"))
  }

  /** DuckDB replay of [[kCenterGreedy]]: `vecsSql` must yield
    * (id, vec) with vec a FLOAT/DOUBLE list; every round unrolls as a
    * CTE pair (min-dist update vs. the previous pick, then the
    * ORDER BY mind DESC, id LIMIT 1 argmax). */
  def kCenterOracleSql(vecsSql: String, k: Int, idOut: String,
                       scale: Double = 1000.0, offset: Long = 10000L): String = {
    require(k >= 1)
    def d(a: String, b: String): String =
      s"CAST(list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) " +
        s"for i in range(1, len($a) + 1)]) AS BIGINT)"
    // p1 = argmax after the seed (round 1); each later pick p_{r+1}
    // needs one more min-dist update CTE m_r vs the previous pick p_r
    val rounds = (1 until k - 1).map { r =>
      s"""m$r AS (SELECT d.id, d.qv,
         |    least(d.mind, ${d("d.qv", "p.qv")}) AS mind
         |  FROM m${r - 1} d, p$r p),
         |p${r + 1} AS (SELECT id, qv, mind FROM m$r
         |  ORDER BY mind DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val picks = (1 until k)
      .map(r => s"SELECT $r AS round, id, mind AS radius_sq FROM p$r")
      .mkString("\nUNION ALL ")
    val tail = if (k <= 2) "" else s",\n$rounds"
    val unions = if (k == 1) "" else s"\nUNION ALL $picks"
    s"""WITH v AS (SELECT id,
       |    list_transform(vec, x ->
       |      CAST(floor(CAST(x AS DOUBLE) * $scale) AS BIGINT) + $offset) AS qv
       |  FROM ($vecsSql)),
       |c0 AS (SELECT id, qv FROM v ORDER BY id LIMIT 1),
       |m0 AS (SELECT v.id, v.qv, ${d("v.qv", "c.qv")} AS mind
       |  FROM v, c0 c),
       |p1 AS (SELECT id, qv, mind FROM m0 ORDER BY mind DESC, id LIMIT 1)$tail
       |SELECT CAST(round AS BIGINT) AS round, CAST(id AS BIGINT) AS $idOut,
       |  CAST(radius_sq AS BIGINT) AS radius_sq FROM (
       |SELECT 0 AS round, id, NULL AS radius_sq FROM c0$unions)
       |ORDER BY round""".stripMargin
  }
}
