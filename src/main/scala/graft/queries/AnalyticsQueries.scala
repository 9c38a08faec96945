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

  /** Interval-overlap self-join: per supplier, pairs of CONCURRENT
    * shipments (deterministic fulfillment windows [ship, ship + 1 +
    * (orderkey + 3·linenumber) mod 21 days], inclusive) with total
    * overlapping days. The naive formulation is a per-supplier
    * quadratic nested loop; [[graft.operators.RangeJoin
    * .intervalOverlapJoin]] makes it a hash equi-join on
    * (supplier, 16-day bin) with an exact residual and a first-shared-
    * bin emit-once guard — no distinct, no pair counted twice. */
  val q133OverlapPairs: Q = (s, d) => {
    def side(sfx: String) = t(s, d, "lineitem")
      .select(col("l_suppkey").as(s"sk_$sfx"),
        col("l_orderkey").as(s"ok_$sfx"),
        col("l_linenumber").cast("long").as(s"ln_$sfx"),
        unix_date(to_date(col("l_shipdate"))).cast("long").as(s"s_$sfx"))
      .withColumn(s"e_$sfx", // end-EXCLUSIVE: last covered day + 1
        col(s"s_$sfx") + lit(2) +
          pmod(col(s"ok_$sfx") + lit(3) * col(s"ln_$sfx"), lit(21)))
    graft.operators.RangeJoin.intervalOverlapJoin(
        side("a"), side("b"), "s_a", "e_a", "s_b", "e_b",
        binWidth = 16L, keyPairs = Seq(("sk_a", "sk_b")))
      .filter(col("ok_a") < col("ok_b") ||
        (col("ok_a") === col("ok_b") && col("ln_a") < col("ln_b")))
      .groupBy(col("sk_a").as("suppkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
          .as("overlap_days"))
      .orderBy("suppkey")
  }

  val queries: Map[String, Q] = Map(
    "q132_basket_rules" -> q132BasketRules,
    "q133_overlap_pairs" -> q133OverlapPairs,
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
    // end-exclusive epoch-day intervals; overlap length in days =
    // least(e) - greatest(s) for end-exclusive bounds
    "q133_overlap_pairs" ->
      """WITH li AS (SELECT l_suppkey AS sk, l_orderkey AS ok,
        |    CAST(l_linenumber AS BIGINT) AS ln,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s
        |  FROM lineitem),
        |iv AS (SELECT sk, ok, ln, s, s + 2 + (ok + 3 * ln) % 21 AS e FROM li)
        |SELECT a.sk AS suppkey, count(*) AS n_pairs,
        |  CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS overlap_days
        |FROM iv a JOIN iv b ON a.sk = b.sk
        |  AND (a.ok < b.ok OR (a.ok = b.ok AND a.ln < b.ln))
        |  AND a.s < b.e AND b.s < a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
