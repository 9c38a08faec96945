package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-quality evaluation — the SIMPLIFIED silhouette (Hruschka et
  * al.'s centroid variant): per point, a = squared L2 to its own
  * group's centroid, b = min squared L2 to any other group's
  * centroid, s = (b − a) / max(a, b) ∈ [−10⁶, 10⁶] ppm. The classic
  * silhouette's per-pair mean distance is O(n²); the centroid form is
  * the one that scales — one pass over the points against k literal
  * centroids — and ranks partitions the same way in practice. Squared
  * distances (no sqrt anywhere) keep every operand an exact integer;
  * s is computed on them, which is documented, deterministic and
  * engine-exact.
  *
  * Determinism: centroids are FLOOR-quantized integer means
  * (floorDiv(Σx_d, n) per dimension — the engine-portable identity,
  * exact under negative sums), so "the centroid" is one well-defined
  * integer vector on every engine; s_ppm uses the same floor identity
  * because b − a can be negative.
  *
  * Scale shape: per-dimension sums via posexplode + partial agg
  * (map-side combined to ≤ k·d rows per partition — the KMeansInt
  * layout); centroids are CONTROL-PLANE (k·d longs, require k ≤ 256)
  * and ship back as literals, so the scoring pass is a shuffle-free
  * projection of compiled integer dot products
  * (dist² = x·x − 2·x·c + c·c with [[o.a.s.sql.graft.LongArrayDot]])
  * plus one k-sized final agg. One corpus scan for sums, one for
  * scores.
  *
  * Magnitude contract: |q| ≤ 10⁶ quantized coordinates and d ≤ 4096
  * keep dist² ≤ 1.6·10¹⁶ (exact LONG); (b−a)·10⁶ runs in
  * DECIMAL(38,0) before the division drops it back under 10⁶.
  *
  * @param df one row per point: (labelCol, vecCol array<long> — the
  *           [[graft.functions.VectorFunctions.quantize]] output)
  * @return one row per label: (labelCol, n, sum_s_ppm, mean_s_ppm,
  *         n_negative — points closer to a foreign centroid)
  */
object ClusterEval {

  private val MaxLabels = 256

  def simplifiedSilhouette(df: DataFrame, labelCol: String,
                           vecCol: String): DataFrame = {
    val pts = Materialize.once(
      df.filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
        .select(col(labelCol).cast("long").as("__l"), col(vecCol).as("__q")))
    // per-label, per-dimension sums: k·d rows after partial agg. The
    // max-|coordinate| contract guard rides the same pass (max over the
    // k·d partial maxima) so the guard costs no extra corpus scan.
    val sumRows = pts
      .select(col("__l"), posexplode(col("__q")).as(Seq("__d", "__x")))
      .groupBy(col("__l"), col("__d"))
      .agg(sum(col("__x")).as("__s"), max(abs(col("__x"))).as("__m"))
      .collect()
    val sums = sumRows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val counts = pts.groupBy(col("__l")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = counts.keys.toSeq.sorted
    require(labels.size >= 2,
      s"simplifiedSilhouette: need >= 2 labels, got ${labels.size}")
    require(labels.size <= MaxLabels,
      s"simplifiedSilhouette: ${labels.size} labels breaks the control-" +
        s"plane k <= $MaxLabels contract; this is a grouping evaluator, " +
        "not a high-cardinality join")
    val dim = sums.map(_._2).max + 1
    // enforce the documented magnitude contract (|coord| ≤ 10⁶,
    // d ≤ 4096 ⇒ dist² ≤ 1.6·10¹⁶ stays exact LONG) — k alone was
    // checked; a wider vector or coarser quantize scale would
    // otherwise overflow the integer dot products silently
    require(dim <= 4096,
      s"simplifiedSilhouette: dim $dim breaks the d <= 4096 exact-LONG " +
        "dist² contract; reduce dimensionality upstream")
    val maxAbsCoord = sumRows.map(_.getLong(3)).max
    require(maxAbsCoord <= 1000000L,
      s"simplifiedSilhouette: max |coordinate| $maxAbsCoord exceeds the " +
        "10^6 quantize contract; rescale the quantization")
    val cent: Map[Long, Array[Long]] = labels.map { l =>
      val arr = new Array[Long](dim)
      sums.filter(_._1 == l).foreach { case (_, d, s) =>
        arr(d) = Math.floorDiv(s, counts(l))
      }
      l -> arr
    }.toMap
    def lits(a: Array[Long]): Column = array(a.map(lit(_)): _*)
    val dot = graft.functions.VectorFunctions.intDot _
    val xx = dot(col("__q"), col("__q"))
    // dist² to label l, entirely inside codegen'd integer dots
    def dist(l: Long): Column = {
      val c = cent(l)
      val cc = c.map(v => v * v).sum
      xx - lit(2L) * dot(col("__q"), lits(c)) + lit(cc)
    }
    val aCol = labels.map(l => when(col("__l") === l, dist(l)))
      .reduce((x, y) => coalesce(x, y))
    val bCol = array_min(array(labels.map(l =>
      when(col("__l") === l, lit(null).cast("long")).otherwise(dist(l))): _*))
    val scored = pts
      .withColumn("__a", aCol).withColumn("__b", bCol)
      .withColumn("__s", when(greatest(col("__a"), col("__b")) === 0L, lit(0L))
        .otherwise(expr(
          """CAST((CAST((__b - __a) AS DECIMAL(38,0)) * 1000000
            |  - ((CAST((__b - __a) AS DECIMAL(38,0)) * 1000000)
            |      % greatest(__a, __b)
            |     + greatest(__a, __b)) % greatest(__a, __b))
            | div greatest(__a, __b) AS BIGINT)""".stripMargin)))
    scored.groupBy(col("__l").as(labelCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__s")).as("sum_s_ppm"),
        sum(when(col("__s") < 0L, 1L).otherwise(0L)).as("n_negative"))
      .select(col(labelCol), col("n"), col("sum_s_ppm"),
        expr("""CAST((sum_s_ppm - ((sum_s_ppm % n) + n) % n) div n
               |  AS BIGINT)""".stripMargin).as("mean_s_ppm"),
        col("n_negative"))
  }

  /** DuckDB replay of [[simplifiedSilhouette]]: per-dimension sums as
    * generated columns, the identical floor identities, HUGEINT ppm
    * arithmetic. `ptsSql` yields (id, label BIGINT-castable,
    * qv BIGINT[dim]) — the id only regroups the point×centroid cross
    * join; the Spark side never needs one. */
  def simplifiedSilhouetteOracleSql(ptsSql: String, labelCol: String,
                                    dim: Int): String = {
    def fd(a: String, b: String) =
      s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) // ($b)"
    val dims = 1 to dim
    val sumCols = dims.map(i => s"sum(qv[$i]) AS s$i").mkString(", ")
    val centCols = dims.map(i =>
      s"${fd(s"s$i", "cnt")} AS c$i").mkString(", ")
    val distExpr = dims.map(i =>
      s"(e.qv[$i] - c.c$i) * (e.qv[$i] - c.c$i)").mkString(" + ")
    s"""WITH e AS (SELECT id, CAST($labelCol AS BIGINT) AS own, qv
       |  FROM ($ptsSql)),
       |sums AS (SELECT own AS l, CAST(count(*) AS BIGINT) AS cnt, $sumCols
       |  FROM e GROUP BY own),
       |cent AS (SELECT l, cnt, $centCols FROM sums),
       |d AS (SELECT e.id, e.own, c.l AS cl, $distExpr AS dist
       |  FROM e CROSS JOIN cent c),
       |ab AS (SELECT own, max(CASE WHEN cl = own THEN dist END) AS a,
       |    min(CASE WHEN cl <> own THEN dist END) AS b
       |  FROM d GROUP BY id, own),
       |sc AS (SELECT own,
       |    CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(${fd("CAST(b - a AS HUGEINT) * 1000000", "greatest(a, b)")}
       |        AS BIGINT) END AS s
       |  FROM ab)
       |SELECT own AS $labelCol, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(s) AS BIGINT) AS sum_s_ppm,
       |  CAST(${fd("CAST(sum(s) AS HUGEINT)", "count(*)")} AS BIGINT)
       |    AS mean_s_ppm,
       |  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
       |FROM sc GROUP BY own
       |ORDER BY $labelCol""".stripMargin
  }
}
