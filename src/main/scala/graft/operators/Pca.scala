package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer power iteration for the corpus' top singular
  * direction (the first principal axis of the UNCENTERED Gram matrix
  * XᵀX — mean-center upstream if classical PCA is wanted). The
  * direction drives embedding compression, whitening diagnostics and
  * SRP-style bucketing; made engine-exact the same way q115's k-means
  * is: every round is integer arithmetic on quantized coordinates, so
  * the fitted axis is bit-reproducible across engines, partitionings
  * and reruns.
  *
  * Scheme: coordinates quantize to `floor(x·scale)`; each round is
  * the MATRIX-FREE application `v' = Σᵢ xᵢ (xᵢ·v)` (never materialize
  * the dim² Gram matrix), then an integer renormalization to
  * max-abs = 10⁶ via the floor-division shift identity
  * `floor(a/b) = (a + K·b) div b − K` (K = 10⁶ + 1), which truncating
  * and flooring engines compute identically. The start vector is
  * all-ones — deterministic; degenerate only for data exactly
  * orthogonal to it.
  *
  * 100 TB shape (the KMeansInt layout): the direction is
  * CONTROL-PLANE — dim longs collected per round and re-shipped as an
  * array literal, so the dot product is a shuffle-free codegen'd
  * `aggregate(zip_with(...))` projection; the per-dimension
  * contribution sum is `posexplode → groupBy(dim)` — dim× fan-out
  * collapsed by map-side partial aggregation to ≤ dim rows per
  * partition before a dim-row exchange. One corpus scan per round.
  *
  * Magnitudes: |qx| ≤ 10⁵ coordinates, dim ≤ 10³ and |v| ≤ 10⁶ keep
  * dots ≤ 10¹⁴ (exact LONG); contribution sums run in DECIMAL(38)
  * (≤ 10¹⁹·n rows). EAGER: quantization is checkpointed and each
  * round runs a job at call time.
  */
object Pca {

  private val Unit6 = 1000000L

  /** (dim, component_ppm) for dims 0..dim-1 — the direction after
    * `iters` integer power-iteration rounds, scaled to
    * max|component| = 10⁶. */
  def powerIteration(vecs: DataFrame, vecCol: String, dim: Int, iters: Int,
                     scale: Double = 1000.0): DataFrame = {
    require(dim >= 1 && iters >= 1, s"need dim>=1, iters>=1 (got $dim, $iters)")
    val q = vecs
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale)).cast("long")).as("__qv"))
      .where(size(col("__qv")) === dim)
      .transform(Materialize.once)

    def applied(v: Array[Long]): DataFrame = {
      val vLit = array(v.map(lit): _*)
      q.select(col("__qv"),
          aggregate(zip_with(col("__qv"), vLit, (x, y) => x * y),
            lit(0L), (acc, e) => acc + e).as("__dot"))
        .select(col("__dot"), posexplode(col("__qv")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(sum(col("x").cast("decimal(38,0)") * col("__dot").cast("decimal(38,0)"))
          .as("s"))
    }

    def floorDivBig(a: BigInt, b: BigInt): BigInt = {
      val (qq, r) = a /% b
      if (r.signum < 0) qq - 1 else qq
    }

    var v = Array.fill(dim)(Unit6)
    for (_ <- 1 until iters) {
      val s = new Array[BigInt](dim)
      applied(v).collect().foreach { r =>
        s(r.getInt(0)) = BigInt(r.getDecimal(1).toBigInteger)
      }
      require(s.forall(_ != null), "vector index gap — dim mismatch?")
      val ma = s.map(_.abs).max
      require(ma.signum > 0, "power iteration degenerated to the zero vector")
      v = s.map(x => floorDivBig(x * Unit6, ma).toLong)
    }

    // final application + renormalization stay IN the plan
    val sdf = applied(v)
    val m = sdf.agg(max(abs(col("s"))).as("ma"))
    sdf.crossJoin(broadcast(m))
      .select(col("dim").cast("long").as("dim"),
        expr(s"(s * $Unit6 + ${Unit6 + 1} * ma) div ma - ${Unit6 + 1}")
          .as("component_ppm"))
      .orderBy("dim")
  }

  /** DuckDB replay of [[powerIteration]]: `vecsSql` must yield
    * (qv BIGINT[]) — the caller quantizes exactly as the operator
    * does. Unrolled CTE per round, HUGEINT arithmetic, same shift
    * renormalization. */
  def powerIterationOracleSql(vecsSql: String, dim: Int, iters: Int): String = {
    val k = Unit6 + 1
    def round(t: Int): String =
      s"""dot$t AS (SELECT rid, sum(qv[dm.d] * v.v) AS dot
         |  FROM e0 CROSS JOIN dims dm JOIN v${t - 1} v ON v.d = dm.d
         |  GROUP BY rid),
         |s$t AS (SELECT dm.d AS d, sum(CAST(qv[dm.d] AS HUGEINT) * dot) AS s
         |  FROM e0 CROSS JOIN dims dm JOIN dot$t USING (rid)
         |  GROUP BY 1),
         |m$t AS (SELECT max(abs(s)) AS ma FROM s$t),
         |v$t AS (SELECT d, CAST((s * $Unit6 + $k * ma) // ma - $k AS BIGINT) AS v
         |  FROM s$t CROSS JOIN m$t)""".stripMargin
    s"""WITH e0 AS (SELECT row_number() OVER () AS rid, qv FROM ($vecsSql)),
       |dims AS (SELECT unnest(range(1, ${dim + 1})) AS d),
       |v0 AS (SELECT unnest(range(1, ${dim + 1})) AS d, $Unit6 AS v),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT CAST(d - 1 AS BIGINT) AS dim, v AS component_ppm
       |FROM v$iters ORDER BY dim""".stripMargin
  }
}
