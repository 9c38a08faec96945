package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding — the feature-engineering workhorse
  * for high-cardinality categoricals: replace a category with the
  * mean target of the OTHER rows in that category, smoothed toward
  * the global prior. Leaving the own row out is what prevents the
  * leakage that makes naive target encoding overfit; the smoothing
  * constant m acts as m pseudo-observations of the prior, so
  * singleton categories get the prior instead of a divide-by-zero:
  *   enc_i = floor((Σ_cat y − y_i + m·prior) / (n_cat − 1 + m)),
  *   prior = floor(Σ y / N)
  * All arithmetic is the engine-portable floor identity (targets may
  * be negative), so the encoding is bit-identical across engines and
  * partitionings.
  *
  * Scale shape: one groupBy(category) stats pass (map-side combined)
  * + one join back on the category key — no window, no per-row state;
  * the global prior is ONE control-plane scalar. Category cardinality
  * is unconstrained (the stats table joins, it never collects).
  */
object Encoding {

  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      yCol: String, smoothing: Long = 20L): DataFrame = {
    require(smoothing >= 1L,
      s"smoothing must be >= 1 (it is the singleton fallback), got $smoothing")
    val rows = Materialize.once(df
      .filter(col(catCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol), col(catCol).as("__c"),
        col(yCol).cast("long").as("__y")))
    val g = rows.agg(sum(col("__y")).cast("decimal(38,0)").as("__ts"),
      count(lit(1)).as("__tn")).head()
    val total = BigInt(g.getDecimal(0).toBigInteger)
    val n = g.getLong(1)
    require(n >= 1, "targetEncodeLoo: empty input")
    // floorDiv on BigInt: round toward -inf like both engines' replay
    val prior = {
      val (q, r) = total /% BigInt(n)
      (if (r < 0) q - 1 else q).toLong
    }
    val stats = rows.groupBy(col("__c"))
      .agg(sum(col("__y")).cast("decimal(38,0)").as("__cs"),
        count(lit(1)).as("__cn"))
    rows.join(stats, Seq("__c"))
      .select(col(idCol), col("__c").as(catCol), col("__y").as(yCol),
        expr(s"""CAST((( __cs - __y + ${smoothing}L * ${prior}L)
                |  - (((( __cs - __y + ${smoothing}L * ${prior}L)
                |        % (__cn - 1 + $smoothing))
                |      + (__cn - 1 + $smoothing)) % (__cn - 1 + $smoothing)))
                | div (__cn - 1 + $smoothing) AS BIGINT)""".stripMargin)
          .as("enc"))
  }

  /** DuckDB replay of [[targetEncodeLoo]]. `relSql` yields
    * (id, cat, y BIGINT-castable). */
  def targetEncodeLooOracleSql(relSql: String, idCol: String,
                               catCol: String, yCol: String,
                               smoothing: Long = 20L): String = {
    def fd(a: String, b: String) =
      s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) // ($b)"
    s"""WITH r AS (SELECT id, cat, CAST(y AS HUGEINT) AS y FROM ($relSql)
       |  WHERE cat IS NOT NULL AND y IS NOT NULL),
       |pr AS (SELECT ${fd("sum(y)", "count(*)")} AS prior FROM r),
       |st AS (SELECT cat, sum(y) AS cs, CAST(count(*) AS HUGEINT) AS cn
       |  FROM r GROUP BY cat)
       |SELECT r.id AS $idCol, r.cat AS $catCol, CAST(r.y AS BIGINT) AS $yCol,
       |  CAST(${fd(s"cs - y + $smoothing * prior", s"cn - 1 + $smoothing")}
       |    AS BIGINT) AS enc
       |FROM r JOIN st USING (cat) CROSS JOIN pr
       |ORDER BY $idCol""".stripMargin
  }
}
