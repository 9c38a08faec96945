package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 analytics tier: association mining, interval analytics,
  * graph statistics, sliding-sketch windows, trend fitting — classic
  * warehouse/mining operators the reference's users run downstream of
  * its tables (vivek-neenopal/shopify-etl feeds Power BI dashboards;
  * these are the dashboard-side computations as engine operators).
  *
  * Same determinism discipline as every other tier: integer/ppm
  * metrics (floor division), exact decimal money sums, total ORDER BY
  * with unique tie-breaks — each query hash-matches its DuckDB oracle.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private val BasketMinSupport = 50L
  private val BasketTopK = 40

  /** Market-basket association rules over order baskets of part
    * BRANDS (the brand dim keeps item cardinality realistic for rule
    * mining; the part join is a broadcast). Apriori item prune → one
    * pair shuffle → broadcast marginals; lift/confidence in exact ppm
    * integers. */
  val q132BasketRules: Q = (s, d) => {
    val baskets = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
    graft.operators.Association.rules(
      baskets, "basket", "item", BasketMinSupport, BasketTopK)
  }

  val queries: Map[String, Q] = Map(
    "q132_basket_rules" -> q132BasketRules,
  )

  val oracles: Map[String, String] = Map(
    "q132_basket_rules" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS basket, p_brand AS item
         |           FROM lineitem JOIN part ON p_partkey = l_partkey),
         |n AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
         |ci AS (SELECT item, count(*) AS c FROM b GROUP BY 1),
         |cab AS (SELECT x.item AS item_a, y.item AS item_b, count(*) AS cab
         |        FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item
         |        GROUP BY 1, 2)
         |SELECT item_a, item_b, cab, ca.c AS ca, cb.c AS cb, n.n_baskets,
         |  CAST((1000000 * CAST(cab AS HUGEINT) * n.n_baskets)
         |       // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_ppm,
         |  CAST((1000000 * CAST(cab AS HUGEINT)) // ca.c AS BIGINT) AS conf_ab_ppm,
         |  CAST((1000000 * CAST(cab AS HUGEINT)) // cb.c AS BIGINT) AS conf_ba_ppm
         |FROM cab JOIN ci ca ON ca.item = item_a
         |         JOIN ci cb ON cb.item = item_b CROSS JOIN n
         |WHERE cab >= $BasketMinSupport
         |ORDER BY lift_ppm DESC, item_a, item_b LIMIT $BasketTopK""".stripMargin,
  )
}
