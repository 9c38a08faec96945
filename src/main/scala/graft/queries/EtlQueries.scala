package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.ShopifyFunctions._

/** ETL-parity operators from SURVEY.md §2 (projection/flatten, scalar
  * functions, aggregation, window-dedup, joins, set ops, merge patterns,
  * sort/limit) expressed as queries over the driver's synthetic corpus,
  * each paired with an equivalent DuckDB oracle.
  *
  * Determinism discipline: every query ends in a total ORDER BY (unique
  * tie-break key) and every money aggregate is summed in exact
  * DECIMAL(18,2) arithmetic (then rendered as double) in BOTH engines —
  * double summation order varies with partitioning, so a float sum would
  * not survive the driver's hash compare (nor a 1000-executor re-run).
  */
object EtlQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Exact money sum: cast addends to DECIMAL(18,2), sum exactly (no
    * float summation-order sensitivity — a requirement once partial
    * aggregates run on 1000 executors), render as double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact `sum(price * (1 - discount))` in decimal arithmetic. */
  private def dsumRevenue: Column =
    sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2)))).cast("double")

  /** Layout-robust reader for `events.parquet`. The driver regenerates
    * testdata between rounds and the physical encoding of `ts` has
    * already changed once (raw INT64 nanoseconds → logical
    * TIMESTAMP_MICROS), silently breaking every absolute-time query —
    * so this reader PROBES the footer schema instead of assuming:
    *
    *  - logical TIMESTAMP / TIMESTAMP_NTZ (micros): take Spark's own
    *    decode; NTZ is cast to session-TZ timestamp (session is pinned
    *    UTC, so wall-clock values are identical to DuckDB's naive read)
    *  - raw INT64 (no logical type): nanoseconds by driver convention —
    *    truncate to micros, matching DuckDB's `CAST(ts AS TIMESTAMP)`
    *  - TIMESTAMP(NANOS) (footer conversion throws
    *    [PARQUET_TYPE_ILLEGAL]): fall back to a declared-LongType read
    *    of the same raw INT64, truncated to micros
    *
    * Any other layout fails loud with the observed type rather than
    * returning plausible-but-wrong rows.
    */
  /** Physical column names from the parquet footer itself (first
    * part-file when `path` is a directory) — the ground truth a
    * declared-schema read silently bypasses. */
  private def footerFields(s: SparkSession, path: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .headOption.getOrElse(p)
      else p
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try rd.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
    finally rd.close()
  }

  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val inferred =
      try Some(s.read.parquet(path)) // footer-schema inference may throw on NANOS
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    def rawNanos: DataFrame = {
      val sch = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      // a DECLARED schema bypasses footer validation — a regenerated
      // table missing a column would read as all-NULL. Check the
      // physical footer field list so a layout drift fails loud.
      val footer = footerFields(s, path)
      val missing = sch.fieldNames.toSet -- footer
      if (missing.nonEmpty) throw new IllegalStateException(
        s"events.parquet at $path lacks physical columns $missing " +
          s"(footer has $footer) — extend EtlQueries.events")
      s.read.schema(sch).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
    inferred match {
      case None => rawNanos
      case Some(df) => df.schema("ts").dataType match {
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => df
        case LongType         => rawNanos
        case other => throw new IllegalStateException(
          s"events.parquet ts has unsupported layout $other at $path — " +
            "extend EtlQueries.events before trusting any events query")
      }
    }
  }

  // ---------------------------------------------------------------- A2/A4
  /** TPC-H Q1-style pricing summary: scan + filter + wide aggregation.
    * Exercises map-side partial aggregation; at 100 TB the only shuffle is
    * 6 groups wide. */
  val q1PricingSummary: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumRevenue.as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue by day — the flagship entry query (SURVEY §7.2). */
  val q2RevenueByDay: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("order_date")

  // ---------------------------------------------------------------- J1/J2
  /** TPC-H Q3-style: selective dim filter + fact join + top-k.
    * customer is broadcast; order/lineitem join shuffles on orderkey. */
  val q3TopOrders: Q = (s, d) => {
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
    val l = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp_ntz"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(dsumRevenue.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Top-3 orders per priority class through the custom whole-operator
    * plan node (partial bounded heap → key Exchange → final heap; see
    * [[org.apache.spark.sql.graft.TopKPerKey]]) — the §7.6 extension
    * surface exercised end-to-end against a window-function oracle.
    * The (price desc, orderkey) order is total, so the row set equals
    * the row_number composition's. */
  val q54TopkPerKey: Q = (s, d) => {
    val o = t(s, d, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    graft.operators.ScaleOps.topKPerKey(o, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** TPC-H Q4-style: EXISTS as left-semi join with a non-equi conjunct. */
  val q4OrderPriority: Q = (s, d) => {
    val o = t(s, d, "orders").filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
      col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val l = t(s, d, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-style: 6-way star join, small dims broadcast, group by nation. */
  val q5RegionRevenue: Q = (s, d) => {
    val r = t(s, d, "region").filter(col("r_name") === "ASIA")
    val n = t(s, d, "nation")
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
      col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = t(s, d, "lineitem")
    val sup = t(s, d, "supplier")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsumRevenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style: pure scan-filter-agg; filters must reach the parquet
    * scan as PushedFilters. */
  val q6ForecastRevenue: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) * col("l_discount").cast(DecimalType(4, 2))).cast("double").as("revenue"))

  // ---------------------------------------------------------------- F1-F8
  /** Scalar-function battery (F1 clean_id, F5 strip-#, F7 normKey, F8
    * date render) applied row-wise — all pure Column exprs, codegen'd. */
  val q7CleanId: Q = (s, d) =>
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        cleanId(concat(lit("gid://shopify/Order/"), col("o_orderkey")), "R-").as("order_id"),
        stripHash(concat(lit("#"), col("o_orderkey"))).as("order_number"),
        normKey(concat(lit("  sku-"), col("o_orderkey"), lit(" "))).as("sku_norm"),
        tsDate(col("o_orderdate")).as("order_day"))
      .orderBy("o_orderkey")

  /** U1 — two-store federation: per-store ID prefixing + UNION ALL
    * (`R-`/`W-` quirk, incremental_loaders.py:83). */
  val q8StoreUnion: Q = (s, d) => {
    val c = t(s, d, "customer")
    val retail = c.filter(col("c_custkey") % 2 === 0)
      .select(concat(lit("R-"), col("c_custkey")).as("customer_id"),
        col("c_name"), round(col("c_acctbal"), 2).as("acctbal"), col("c_nationkey"))
    val wholesale = c.filter(col("c_custkey") % 2 === 1)
      .select(concat(lit("W-"), col("c_custkey")).as("customer_id"),
        col("c_name"), round(col("c_acctbal"), 2).as("acctbal"), col("c_nationkey"))
    retail.unionByName(wholesale).orderBy("customer_id")
  }

  // ---------------------------------------------------------------- A5
  /** Window dedup — keep-latest-per-key (`DISTINCT ON` semantics,
    * run_logs.txt:346-361) with a fixed total order for tie-breaks. */
  val q9LatestOrderPerCustomer: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("last_order_date"),
        round(col("o_totalprice"), 2).as("last_price"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- J3
  /** Anti-join gap-fill shape (wholesale SKUs NOT IN retail,
    * run_logs.txt:382-391): customers with no recent orders, rolled up. */
  val q10CustomersWithoutOrders: Q = (s, d) => {
    val recent = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
    t(s, d, "customer")
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("c_nationkey")
  }

  // ---------------------------------------------------------------- W2/J4
  /** Delete-matched + reload (fact_order_items.sql, run_logs.txt:545-573):
    * anti-join keeps unmatched target rows, staged rows re-appended. */
  val q11DeleteReload: Q = (s, d) => {
    val staged = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp_ntz"))
      .select(col("o_orderkey"))
    val li = t(s, d, "lineitem")
    val kept = li.join(staged, li("l_orderkey") === staged("o_orderkey"), "left_anti")
      .withColumn("src", lit("kept"))
    val reloaded = li.join(staged, li("l_orderkey") === staged("o_orderkey"), "left_semi")
      .withColumn("src", lit("staged"))
    kept.unionByName(reloaded)
      .groupBy("src")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("src")
  }

  // ---------------------------------------------------------------- W1
  /** Upsert (fact_orders.sql ON CONFLICT DO UPDATE, run_logs.txt:472-541):
    * result = staged ∪ (target ⟕anti staged), validated via rollup. */
  val q12Upsert: Q = (s, d) => {
    val target = t(s, d, "orders")
    val staged = target
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      // price bump in exact decimal arithmetic: double round() differs
      // between JVM (shortest-repr HALF_UP) and C++ (scaled std::round)
      .withColumn("o_totalprice",
        expr("CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST('1.05' AS DECIMAL(3,2)), 2) AS DOUBLE)"))
    val merged = staged.unionByName(
      target.join(staged.select("o_orderkey"), Seq("o_orderkey"), "left_anti"))
    merged.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderstatus")
  }

  // ---------------------------------------------------------------- A3/P6
  /** Inventory-style bucket fold (quantities per name → fixed columns,
    * incremental_loaders.py:318-323): conditional sums per return flag. */
  val q13InventoryPivot: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_partkey")
      .agg(
        round(coalesce(sum(when(col("l_returnflag") === "A", col("l_quantity"))), lit(0.0)), 2).as("qty_a"),
        round(coalesce(sum(when(col("l_returnflag") === "N", col("l_quantity"))), lit(0.0)), 2).as("qty_n"),
        round(coalesce(sum(when(col("l_returnflag") === "R", col("l_quantity"))), lit(0.0)), 2).as("qty_r"))
      .orderBy("l_partkey")

  // ---------------------------------------------------------------- A1
  /** Watermark max over ISO-rendered timestamps (lexicographic == chrono
    * quirk, incremental_loaders.py:127-131). */
  val q14Watermark: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(max(tsIso(col("o_orderdate"))).as("watermark"))
      .orderBy("o_orderstatus")

  // ---------------------------------------------------------------- top-k
  /** Sort/limit with total order: top customers by revenue. */
  val q15TopCustomers: Q = (s, d) =>
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)

  // ---------------------------------------------------------------- JSON
  /** Semi-structured props extraction (get_json_object ≙ DuckDB
    * json_extract_string) + rollup. */
  val q16EventsJson: Q = (s, d) =>
    events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("event_type")

  /** Tumbling-window aggregation (batch shape of a streaming windowed agg). */
  val q17EventsHourly: Q = (s, d) =>
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("hour", "event_type")

  /** Sessionization: lag + gap>30min cumulative session ids — the classic
    * event-stream window composition. */
  val q18Sessions: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max("sess_id").as("n_sessions"), count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id")
  }

  /** S7/P2/F1-F6 in query form: construct GraphQL-shaped JSON from base
    * columns, parse with the declared order schema, flatten through the
    * engine's money/clean_id/pyStr chain. The oracle computes the
    * expected outputs INDEPENDENTLY from the base columns (no JSON at
    * all), so the whole construct→parse→flatten path is checked against
    * ground truth, not a mirrored computation. */
  val q34JsonFlatten: Q = (s, d) => {
    import graft.functions.ShopifyFunctions._
    val k = col("o_orderkey")
    val price = col("o_totalprice").cast(DecimalType(18, 2)).cast("string")
    val moneyJs = when(k % 3 === 0,
        concat(lit("""{"shopMoney": {"amount": """"), price,
          lit("""", "currencyCode": "USD"}}""")))
      .when(k % 3 === 1, concat(lit("""{"amount": """"), price, lit("\"}")))
      .otherwise(lit("null"))
    val confirmedJs = when(k % 2 === 0, lit("true")).otherwise(lit("null"))
    val customerJs = when(k % 3 === 2, lit("null"))
      .otherwise(concat(lit("""{"id": "gid://shopify/Customer/"""),
        col("o_custkey"), lit("\"}")))
    val tagsJs = when(k % 4 === 0, lit("null")).otherwise(lit("""["vip", "promo"]"""))
    val js = concat(
      lit("""{"id": "gid://shopify/Order/"""), k,
      lit("""", "name": "#"""), k, lit("\""),
      lit(""", "confirmed": """), confirmedJs,
      lit(""", "tags": """), tagsJs,
      lit(""", "totalPriceSet": """), moneyJs,
      lit(""", "customer": """), customerJs, lit("}"))
    val parsed = from_json(js, graft.model.Schemas.orderNode).as("o")
    t(s, d, "orders").select(k.as("o_orderkey"), parsed)
      .select(
        col("o_orderkey"),
        cleanId(col("o.id"), "R-").as("order_id"),
        stripHash(col("o.name")).as("order_number"),
        when(col("o.confirmed").isNull, lit("False"))
          .otherwise(pyStr(col("o.confirmed"))).as("confirmed"),
        joinTags(col("o.tags")).as("tags"),
        money(col("o.totalPriceSet")).as("total_price"),
        cleanId(col("o.customer.id"), "R-").as("customer_id"))
      .orderBy("o_orderkey")
  }

  /** Left outer join + distribution (TPC-H Q13 shape): orders per
    * customer including zero, then the histogram. */
  val q35LeftJoinHistogram: Q = (s, d) => {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders")) // count() skips nulls
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /** Distinct-count aggregation (TPC-H Q16 shape). */
  val q36DistinctCounts: Q = (s, d) =>
    t(s, d, "lineitem")
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  /** Group-filter (HAVING) + join back (TPC-H Q18 shape): large orders. */
  val q37LargeOrders: Q = (s, d) => {
    val big = t(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > 150) // HAVING
    big.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_date"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Scalar subquery + anti join (TPC-H Q22 shape): above-average-balance
    * customers with no recent orders. The global average is computed as
    * exact-decimal-sum / count so the comparison threshold is identical
    * in both engines (a float avg differs in the last bits). */
  val q38RichInactive: Q = (s, d) => {
    val c = t(s, d, "customer")
    val avgDf = c.agg(
      (sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    val recent = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
    c.crossJoin(broadcast(avgDf))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** Min-by-group join-back (TPC-H Q2 shape) without a self-join:
    * `min(struct(price, suppkey))` picks the cheapest supplier per part
    * in one aggregation — struct ordering doubles as the tie-break. */
  val q39CheapestSupplier: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_partkey")
      .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("best"))
      .select(col("l_partkey"),
        col("best.l_suppkey").as("best_suppkey"),
        col("best.l_extendedprice").as("best_price"))
      .orderBy("l_partkey")

  /** Range join (funnel): purchases within 24h of a signup, per user. */
  val q40Funnel: Q = (s, d) => {
    val e = events(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    signups.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_conversions"), dsum(col("value")).as("conv_value"))
      .orderBy("user_id")
  }

  /** ROLLUP grouping sets with explicit grouping id; null subtotal keys
    * coalesced before ORDER BY (Spark sorts nulls first, DuckDB last). */
  val q41Rollup: Q = (s, d) =>
    t(s, d, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"),
        // grouping() is only valid inside the rollup aggregation itself
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("long").as("gid"))
      .orderBy(col("gid"),
        coalesce(col("o_orderstatus"), lit("~")),
        coalesce(col("o_orderpriority"), lit("~")))

  /** Running total window (cumulative daily revenue) — summed in exact
    * decimal inside the frame so the cumulative doubles are identical
    * across engines. The single global window is fine here: the input
    * is an already-aggregated daily rollup, thousands of rows at most. */
  val q44RunningTotal: Q = (s, d) => {
    val daily = t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val w = Window.orderBy(col("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("order_date"),
        col("rev").cast("double").as("revenue"),
        sum(col("rev")).over(w).cast("double").as("cumulative_revenue"))
      .orderBy("order_date")
  }

  /** RANGE-frame moving window (7 calendar days, not 7 rows): trailing
    * revenue per day keyed on epoch-day so the frame bound is a value
    * range — days absent from the data correctly shrink the window,
    * which a ROWS frame gets wrong. Decimal accumulation, double only
    * at presentation. */
  val q72MovingWindow: Q = (s, d) => {
    val daily = t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .withColumn("day", unix_date(col("order_date")).cast("long"))
    val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
    daily.select(col("order_date"),
        col("rev").cast("double").as("revenue"),
        sum(col("rev")).over(w).cast("double").as("trailing_7d"),
        count(lit(1)).over(w).as("days_in_window"))
      .orderBy("order_date")
  }

  /** CUBE aggregate with grouping_id: all four (status × priority)
    * grouping combinations in one pass — the OLAP subtotal lattice.
    * The grouping id disambiguates a NULL key from an aggregated-out
    * key. */
  val q73Cube: Q = (s, d) =>
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy("gid", "o_orderstatus", "o_orderpriority")

  /** Per-user purchase deltas via lag/lead — the bounded-frame window
    * shape (state per partition key only; no global sort). Gaps in
    * exact integer micros; value deltas are double-minus-double of
    * identical inputs, so both are engine-portable. */
  val q61EventDeltas: Q = (s, d) => {
    val e = events(s, d).filter(col("event_type") === "purchase")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        (col("value") - lag(col("value"), 1).over(w)).as("dvalue"),
        lead(col("event_id"), 1).over(w).as("next_event_id"))
      .orderBy("user_id", "event_id")
  }

  /** Exact median per group (both engines interpolate the middle pair). */
  val q45Median: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(median(col("o_totalprice")).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Exact grouped percentiles by integer rank selection (type-1
    * quantile, rank = max(1, ceil(n·p/100)) computed in integer
    * arithmetic) — the emitted value is selected, never computed, so
    * it ports bit-exactly for doubles. Contrast q45's interpolating
    * builtin `median`. */
  val q111Percentiles: Q = (s, d) =>
    graft.operators.Quantiles.exactPercentiles(
      t(s, d, "orders"), Seq("o_orderpriority"), "o_totalprice",
      Seq(25, 50, 75, 95, 99))
      .orderBy("o_orderpriority", "pct")

  /** Exact GLOBAL percentiles over all of lineitem by iterative
    * histogram refinement — no global sort, no single-partition
    * window; buckets/threshold sized so sf0.01 already exercises ≥2
    * refinement rounds. The oracle answers by global rank (algorithm-
    * independent semantics: the value AT rank ceil(n·p/100)). */
  val q121GlobalPercentiles: Q = (s, d) =>
    graft.operators.Quantiles.exactGlobalPercentiles(
      t(s, d, "lineitem"), "l_extendedprice", Seq(25, 50, 75, 95, 99),
      buckets = 64, directThreshold = 5000L)
      .orderBy("pct")

  /** Per-user ordered event sequences — the behavior-sequence
    * assembly pass for sequential-model training data. `sort_array`
    * over (ts, event_id, type) structs orders WITHIN the aggregation
    * (no window sort, one shuffle); the emitted fingerprint pins the
    * full type sequence while keeping the compared rows small. */
  val q124UserSequences: Q = (s, d) =>
    events(s, d)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type")))).as("seq"))
      .select(col("user_id"),
        size(col("seq")).cast("long").as("n_events"),
        col("seq")(0).getField("event_type").as("first_type"),
        element_at(col("seq"), -1).getField("event_type").as("last_type"),
        md5(concat_ws(",", expr("transform(seq, x -> x.event_type)")))
          .as("seq_fp"))
      .orderBy("user_id")

  /** Cohort retention matrix: users bucketed by first-seen week
    * (pure integer week index — epoch_us div one week, no calendar/tz
    * semantics to diverge on), counted per week offset thereafter. */
  val q125CohortRetention: Q = (s, d) => {
    val e = events(s, d)
      .withColumn("wk", expr("unix_micros(ts) div 604800000000"))
    val firstWk = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    e.select("user_id", "wk").distinct()
      .join(firstWk, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** Event-type transition matrix with integer-quantized row
    * probabilities — the Markov-chain summary of user behavior
    * (lag within (user, time) order, then global pair counts). */
  val q126EventTransitions: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum("n").over(Window.partitionBy(col("prev_type"))))
      .withColumn("p_q", expr("(n * 1000000) div row_total"))
      .orderBy("prev_type", "next_type")
  }

  /** Multi-field record linkage over customers ∪ dirty copies (every
    * 10th customer re-stated under id+3,000,000 with its name's 2nd
    * char dropped): fuzzy-name blocking + weighted integer agreement
    * score. The oracle recomputes scores over a BRUTE-FORCE cross
    * join — a hash match proves the blocking found every pair. */
  val q130RecordLinkage: Q = (s, d) => {
    val base = t(s, d, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val dirty = base.filter(col("c_custkey") % 10 === 0)
      .select((col("c_custkey") + 3000000).as("c_custkey"),
        concat(substring(col("c_name"), 1, 1), substring(col("c_name"), 3, 1000))
          .as("c_name"),
        col("c_nationkey"), col("c_mktsegment"))
    graft.operators.RecordLinkage.link(base.unionByName(dirty),
      "c_custkey", "c_name",
      Seq("c_nationkey" -> 15, "c_mktsegment" -> 15),
      // radius-1 blocking: the dirty copies are single-char deletions,
      // and radius-2 key fan-out costs ~|name|× more for no recall here
      nameWeightByDist = Seq(50, 30), threshold = 45)
      .orderBy("id_a", "id_b")
  }

  /** CDC snapshot diff between two constructed order-table versions:
    * before = pre-1998 orders; after = all orders with a +1.00
    * correction on every key ≡ 0 (mod 100). Inserts are the 1998+
    * keys, updates the corrected pre-1998 keys; the oracle classifies
    * by explicit column comparison (the operator hashes — equivalent
    * per engine). */
  val q131SnapshotDiff: Q = (s, d) => {
    val orders = t(s, d, "orders")
    val before = orders.filter(year(col("o_orderdate")) < 1998)
    val after = orders.withColumn("o_totalprice",
      col("o_totalprice") +
        when(col("o_orderkey") % 100 === 0, 1.0).otherwise(0.0))
    graft.operators.MergeOps.snapshotDiff(before, after, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Per-user daily forward-fill resample: sparse events → a dense
    * integer-epoch-day grid with last-observation-carried-forward
    * (and the observation's day). One key shuffle — see
    * [[graft.operators.TimeOps.resampleFfill]]. */
  val q129ResampleFfill: Q = (s, d) =>
    graft.operators.TimeOps.resampleFfill(
      events(s, d), Seq("user_id"), "ts", "event_id", "value")
      .orderBy("user_id", "day")

  /** As-of join: for each 'view' event, the user's latest 'click' value
    * at-or-before it (point-in-time lookup; ns timestamps make ties
    * impossible). Oracle: DuckDB's native ASOF LEFT JOIN. */
  val q46AsofJoin: Q = (s, d) => {
    val e = events(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    graft.operators.AsofJoin.leftAsof(views, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("asof_click_value"))
      .orderBy("user_id", "event_id")
  }

  /** Salted two-phase aggregation (the skew-mitigation shape: hot keys
    * split across `saltBuckets` reducers first, then re-aggregated).
    * Values are summed as DECIMAL(18,2) so both phases are exact and
    * the result is bit-identical to the oracle's single-phase sum on
    * any partition layout — the algebraic-correctness proof of the
    * salting rewrite. */
  val q49SaltedSum: Q = (s, d) => {
    val li = t(s, d, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    graft.operators.ScaleOps.saltedSum(li, "l_returnflag", "qty")
      .select(col("l_returnflag"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("count"))
      .orderBy("l_returnflag")
  }

  /** Range (point-in-interval) join via the bin-join rewrite: per
    * order, the number of distinct corpus-wide ship DAYS that fall in
    * its deterministic fulfillment window [orderdate, orderdate + 1 +
    * orderkey%14 days). The naive inequality join is a nested loop /
    * cartesian; RangeJoin makes it a hash equi-join on 7-day bins with
    * an exact residual — same rows, scale-safe plan (RangeJoinSpec
    * proves bin-width independence). Dates compare as epoch days in
    * Spark and as native DATEs in DuckDB — identical order under UTC. */
  val q71RangeJoin: Q = (s, d) => {
    val orders = t(s, d, "orders").select(
      col("o_orderkey"),
      unix_date(to_date(col("o_orderdate"))).cast("long").as("win_start"))
      .withColumn("win_end", col("win_start") + 1 + pmod(col("o_orderkey"), lit(14)))
    val shipDays = t(s, d, "lineitem")
      .select(unix_date(to_date(col("l_shipdate"))).cast("long").as("ship_day"))
      .distinct()
    graft.operators.RangeJoin.intervalPointJoin(
        orders, shipDays, "win_start", "win_end", "ship_day", binWidth = 7L)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_ship_days"))
      .orderBy("o_orderkey")
  }

  /** Dynamic pivot: revenue per order year × order status, with the
    * pivot VALUES DISCOVERED from the data (no explicit value list —
    * Spark runs the distinct scan, then plans the wide aggregate; at
    * 100 TB that discovery pass is one cheap column-pruned distinct,
    * and the pivot itself stays a SINGLE hash aggregate, never a
    * per-value self-join). Exact decimal sums per cell; empty cells
    * are NULL in both engines. */
  val q88Pivot: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .pivot("o_orderstatus")
      .agg(dsum(col("o_totalprice")))
      .orderBy("order_year")

  val queries: Map[String, Q] = Map(
    "q88_pivot" -> q88Pivot,
    "q71_range_join" -> q71RangeJoin,
    "q49_salted_sum" -> q49SaltedSum,
    "q34_json_flatten" -> q34JsonFlatten,
    "q46_asof_join" -> q46AsofJoin,
    "q40_funnel" -> q40Funnel,
    "q41_rollup" -> q41Rollup,
    "q44_running_total" -> q44RunningTotal,
    "q45_median" -> q45Median,
    "q111_percentiles" -> q111Percentiles,
    "q121_global_percentiles" -> q121GlobalPercentiles,
    "q124_user_sequences" -> q124UserSequences,
    "q129_resample_ffill" -> q129ResampleFfill,
    "q130_record_linkage" -> q130RecordLinkage,
    "q131_snapshot_diff" -> q131SnapshotDiff,
    "q125_cohort_retention" -> q125CohortRetention,
    "q126_event_transitions" -> q126EventTransitions,
    "q72_moving_window" -> q72MovingWindow,
    "q73_cube" -> q73Cube,
    "q35_left_join_histogram" -> q35LeftJoinHistogram,
    "q36_distinct_counts" -> q36DistinctCounts,
    "q37_large_orders" -> q37LargeOrders,
    "q38_rich_inactive" -> q38RichInactive,
    "q39_cheapest_supplier" -> q39CheapestSupplier,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_revenue_by_day" -> q2RevenueByDay,
    "q3_top_orders" -> q3TopOrders,
    "q4_order_priority" -> q4OrderPriority,
    "q5_region_revenue" -> q5RegionRevenue,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q7_clean_id" -> q7CleanId,
    "q8_store_union" -> q8StoreUnion,
    "q9_latest_order" -> q9LatestOrderPerCustomer,
    "q10_anti_join" -> q10CustomersWithoutOrders,
    "q11_delete_reload" -> q11DeleteReload,
    "q12_upsert" -> q12Upsert,
    "q13_inventory_pivot" -> q13InventoryPivot,
    "q14_watermark" -> q14Watermark,
    "q15_top_customers" -> q15TopCustomers,
    "q16_events_json" -> q16EventsJson,
    "q17_events_hourly" -> q17EventsHourly,
    "q18_sessions" -> q18Sessions,
    "q54_topk_per_key" -> q54TopkPerKey,
    "q61_event_deltas" -> q61EventDeltas,
  )

  val oracles: Map[String, String] = Map(
    // the pivot values F/O/P are data-discovered on the Spark side;
    // the oracle enumerates them (DuckDB PIVOT would also work, but
    // explicit CASE keeps the cell arithmetic visibly identical)
    "q88_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q61_event_deltas" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |  value - lag(value) OVER w AS dvalue,
        |  lead(event_id) OVER w AS next_event_id
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q54_topk_per_key" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q46_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events), v AS (SELECT user_id, event_id, ts, value FROM e WHERE event_type = 'view'), c AS (SELECT user_id, ts, value AS click_value FROM e WHERE event_type = 'click') SELECT v.user_id, v.event_id, v.value, c.click_value AS asof_click_value FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts >= c.ts ORDER BY v.user_id, v.event_id""",
    "q40_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events), s AS (SELECT user_id, ts AS signup_ts FROM e WHERE event_type = 'signup'), p AS (SELECT user_id, ts AS purchase_ts, value FROM e WHERE event_type = 'purchase') SELECT s.user_id, count(*) AS n_conversions, CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS conv_value FROM s JOIN p ON s.user_id = p.user_id AND p.purchase_ts >= s.signup_ts AND p.purchase_ts <= s.signup_ts + INTERVAL 24 HOURS GROUP BY s.user_id ORDER BY s.user_id""",
    "q41_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority) AS BIGINT) AS gid FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ORDER BY gid, coalesce(o_orderstatus, '~'), coalesce(o_orderpriority, '~')""",
    "q44_running_total" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS order_date, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM orders GROUP BY 1) SELECT order_date, CAST(rev AS DOUBLE) AS revenue, CAST(sum(rev) OVER (ORDER BY order_date ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumulative_revenue FROM daily ORDER BY order_date""",
    "q72_moving_window" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS order_date,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
        |  CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day
        |  FROM orders GROUP BY 1, 3)
        |SELECT order_date, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(sum(rev) OVER w AS DOUBLE) AS trailing_7d,
        |  CAST(count(*) OVER w AS BIGINT) AS days_in_window
        |FROM daily
        |WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY order_date""".stripMargin,
    "q73_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "q45_median" ->
      """SELECT o_orderstatus, CAST(median(o_totalprice) AS DOUBLE) AS median_price, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // global rank selection — the oracle states the SEMANTICS (value
    // at rank), not the histogram-refinement algorithm
    "q121_global_percentiles" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |p(pct) AS (VALUES (25), (50), (75), (95), (99))
        |SELECT pct, v AS pct_value, n FROM r, p, n
        |WHERE rn = greatest(1, (n * pct + 99) // 100)
        |ORDER BY pct""".stripMargin,
    // type-1 quantile via integer rank math ((n*p+99)//100); the value
    // is SELECTED, not computed, so doubles port bit-exactly
    "q111_percentiles" ->
      """WITH ranked AS (SELECT o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders),
        |p(pct) AS (VALUES (25), (50), (75), (95), (99))
        |SELECT o_orderpriority, pct, o_totalprice AS pct_value, n
        |FROM ranked, p WHERE rn = greatest(1, (n * pct + 99) // 100)
        |ORDER BY o_orderpriority, pct""".stripMargin,
    // single-phase exact sum — the salted two-phase plan must equal it
    "q49_salted_sum" ->
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS count FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q71_range_join" ->
      """WITH w AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ws,
        |  CAST(o_orderdate AS DATE) + CAST(1 + o_orderkey % 14 AS INTEGER) AS we
        |  FROM orders),
        |days AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS ship_day FROM lineitem)
        |SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_ship_days
        |FROM w JOIN days ON ship_day >= ws AND ship_day < we
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q35_left_join_histogram" ->
      """SELECT n_orders, count(*) AS n_customers FROM (SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""",
    "q36_distinct_counts" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers, count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_items FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand""",
    "q37_large_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date, total_qty FROM (SELECT l_orderkey, round(sum(l_quantity),2) AS total_qty FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity),2) > 150) JOIN orders ON l_orderkey = o_orderkey ORDER BY total_qty DESC, o_orderkey LIMIT 20""",
    "q38_rich_inactive" ->
      """WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal FROM customer) SELECT c_nationkey, count(*) AS n_customers, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal FROM customer, a WHERE c_acctbal > a.avg_bal AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01') GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q39_cheapest_supplier" ->
      """SELECT l_partkey, best_suppkey, best_price FROM (SELECT l_partkey, l_suppkey AS best_suppkey, l_extendedprice AS best_price, row_number() OVER (PARTITION BY l_partkey ORDER BY l_extendedprice, l_suppkey) AS rn FROM lineitem) WHERE rn = 1 ORDER BY l_partkey""",
    "q34_json_flatten" ->
      """SELECT o_orderkey, 'R-' || o_orderkey AS order_id, CAST(o_orderkey AS VARCHAR) AS order_number, CASE WHEN o_orderkey % 2 = 0 THEN 'True' ELSE 'False' END AS confirmed, CASE WHEN o_orderkey % 4 = 0 THEN '' ELSE 'vip,promo' END AS tags, CASE WHEN o_orderkey % 3 IN (0, 1) THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) ELSE 0.0 END AS total_price, CASE WHEN o_orderkey % 3 = 2 THEN NULL ELSE 'R-' || o_custkey END AS customer_id FROM orders ORDER BY o_orderkey""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price, round(avg(l_quantity),2) AS avg_qty, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q2_revenue_by_day" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_date, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n_orders FROM orders GROUP BY 1 ORDER BY 1""",
    "q3_top_orders" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01' AND l_shipdate > TIMESTAMP '1999-01-01' GROUP BY l_orderkey, CAST(o_orderdate AS DATE) ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders o WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate) GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q5_region_revenue" ->
      """SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue FROM customer, orders, lineitem, supplier, nation, region WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q7_clean_id" ->
      """SELECT o_orderkey, 'R-' || split_part('gid://shopify/Order/' || o_orderkey, '/', -1) AS order_id, replace('#' || o_orderkey, '#', '') AS order_number, upper(trim('  sku-' || o_orderkey || ' ')) AS sku_norm, strftime(o_orderdate, '%Y-%m-%d') AS order_day FROM orders ORDER BY o_orderkey""",
    "q8_store_union" ->
      """SELECT * FROM (SELECT 'R-' || c_custkey AS customer_id, c_name, round(c_acctbal,2) AS acctbal, c_nationkey FROM customer WHERE c_custkey % 2 = 0 UNION ALL SELECT 'W-' || c_custkey, c_name, round(c_acctbal,2), c_nationkey FROM customer WHERE c_custkey % 2 = 1) ORDER BY customer_id""",
    "q9_latest_order" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date, round(o_totalprice,2) AS last_price FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
    "q10_anti_join" ->
      """SELECT c_nationkey, count(*) AS n_customers, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01') GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q11_delete_reload" ->
      """WITH staged AS (SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'), merged AS (SELECT 'kept' AS src, l_extendedprice FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM staged) UNION ALL SELECT 'staged' AS src, l_extendedprice FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM staged)) SELECT src, count(*) AS n_items, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price FROM merged GROUP BY src ORDER BY src""",
    "q12_upsert" ->
      """WITH staged AS (SELECT o_orderkey, o_orderstatus, CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST('1.05' AS DECIMAL(3,2)), 2) AS DOUBLE) AS o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'), merged AS (SELECT o_orderstatus, o_totalprice FROM staged UNION ALL SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)) SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q13_inventory_pivot" ->
      """SELECT l_partkey, round(coalesce(sum(CASE WHEN l_returnflag='A' THEN l_quantity END),0),2) AS qty_a, round(coalesce(sum(CASE WHEN l_returnflag='N' THEN l_quantity END),0),2) AS qty_n, round(coalesce(sum(CASE WHEN l_returnflag='R' THEN l_quantity END),0),2) AS qty_r FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""",
    "q14_watermark" ->
      """SELECT o_orderstatus, max(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')) AS watermark FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q15_top_customers" ->
      """SELECT c_custkey, c_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""",
    "q16_events_json" ->
      """SELECT event_type, count(*) AS n, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k FROM events GROUP BY event_type ORDER BY event_type""",
    "q17_events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // explicit column-compare classification (engine-local hashes on
    // the Spark side are equivalent: equal values render equal)
    "q131_snapshot_diff" ->
      """WITH before AS (SELECT * FROM orders WHERE year(o_orderdate) < 1998),
        |after AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + (CASE WHEN o_orderkey % 100 = 0 THEN 1.0 ELSE 0.0 END) AS o_totalprice,
        |  o_orderdate, o_orderpriority FROM orders),
        |d AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |       WHEN a.o_orderkey IS NULL THEN 'delete'
        |       WHEN (b.o_custkey IS DISTINCT FROM a.o_custkey)
        |         OR (b.o_orderstatus IS DISTINCT FROM a.o_orderstatus)
        |         OR (b.o_totalprice IS DISTINCT FROM a.o_totalprice)
        |         OR (b.o_orderdate IS DISTINCT FROM a.o_orderdate)
        |         OR (b.o_orderpriority IS DISTINCT FROM a.o_orderpriority)
        |       THEN 'update' ELSE 'unchanged' END AS op
        |  FROM before b FULL OUTER JOIN after a ON b.o_orderkey = a.o_orderkey)
        |SELECT o_orderkey, op FROM d WHERE op <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,
    // brute-force rescoring of every pair — completeness proof for the
    // deletion-neighborhood blocking (all-integer score surface)
    "q130_record_linkage" ->
      """WITH corpus AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 3000000, substr(c_name, 1, 1) || substr(c_name, 3),
        |    c_nationkey, c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0),
        |p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS d,
        |  (CASE WHEN a.c_nationkey = b.c_nationkey THEN 15 ELSE 0 END) +
        |  (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 15 ELSE 0 END) AS fs
        |  FROM corpus a JOIN corpus b ON a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, CAST(d AS INTEGER) AS name_dist,
        |  CAST((CASE d WHEN 0 THEN 50 ELSE 30 END) + fs AS INTEGER) AS score
        |FROM p
        |WHERE d <= 1 AND (CASE d WHEN 0 THEN 50 ELSE 30 END) + fs >= 45
        |ORDER BY id_a, id_b""".stripMargin,
    // union-marker LOCF replay: same (day, marker-last, ts, seq) order,
    // last_value IGNORE NULLS carries obs into grid rows
    "q129_resample_ffill" ->
      """WITH e AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id AS seq, value AS v FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |spine AS (SELECT unnest(range((SELECT lo FROM b), (SELECT hi FROM b) + 1)) AS day),
        |grid AS (SELECT u.user_id, s.day, 9223372036854775807 AS us,
        |  9223372036854775807 AS seq, CAST(NULL AS DOUBLE) AS v, 1 AS g
        |  FROM (SELECT DISTINCT user_id FROM e) u, spine s),
        |obs AS (SELECT user_id, day, us, seq, v, 0 AS g FROM e),
        |u AS (SELECT * FROM obs UNION ALL SELECT * FROM grid),
        |f AS (SELECT user_id, day, g,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day, g, us, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
        |  last_value(CASE WHEN g = 0 THEN day END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day, g, us, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_obs_day
        |  FROM u)
        |SELECT user_id, day, value_ffill, CAST(last_obs_day AS BIGINT) AS last_obs_day
        |FROM f WHERE g = 1 ORDER BY user_id, day""".stripMargin,
    "q124_user_sequences" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |seq AS (SELECT user_id, list(event_type ORDER BY us, event_id) AS types
        |  FROM e GROUP BY user_id)
        |SELECT user_id, CAST(len(types) AS BIGINT) AS n_events,
        |  types[1] AS first_type, types[len(types)] AS last_type,
        |  md5(array_to_string(types, ',')) AS seq_fp
        |FROM seq ORDER BY user_id""".stripMargin,
    // integer week index (epoch_us // one week): no calendar/tz drift
    "q125_cohort_retention" ->
      """WITH e AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, wk FROM e)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset,
        |  count(DISTINCT a.user_id) AS active_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY cohort_wk, wk - cohort_wk
        |ORDER BY cohort_wk, week_offset""".stripMargin,
    "q126_event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  CAST(ts AS TIMESTAMP) AS ts FROM events),
        |lagged AS (SELECT event_type AS next_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM e),
        |cnt AS (SELECT prev_type, next_type, count(*) AS n
        |  FROM lagged WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
        |tot AS (SELECT *, CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total FROM cnt)
        |SELECT prev_type, next_type, n, row_total,
        |  (n * 1000000) // row_total AS p_q
        |FROM tot ORDER BY prev_type, next_type""".stripMargin,
    "q18_sessions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events), lagged AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e), flagged AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM lagged), sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM flagged) SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value FROM sess GROUP BY user_id ORDER BY user_id""",
  )
}
