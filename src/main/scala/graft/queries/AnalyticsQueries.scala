package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Triangle census of the part co-purchase AFFINITY graph (parts
    * linked when co-purchased in >= 2 distinct orders — the support
    * threshold is what keeps the graph an affinity signal rather than
    * a quadratic blowup of every big basket: support-1 pairs are two
    * orders of magnitude more numerous and pure noise). Edges are
    * generated ARRAY-SIDE per order (no basket self-join) and
    * support-counted in one shuffle, then [[graft.operators.GraphOps
    * .triangleStats]] counts triangles by degree-ordered orientation —
    * out-degrees bounded O(√m), so hub parts cannot blow up the wedge
    * join. One summary row with the exact global clustering
    * coefficient in ppm. */
  /** Support-≥2 co-purchase part graph (array-side pair generation,
    * one shuffle) — shared by q134's triangle census and q218's link
    * prediction. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"))
        .as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)

  val q134Triangles: Q = (s, d) =>
    graft.operators.GraphOps.triangleStats(coPurchaseEdges(s, d), "u", "v")

  /** Adamic–Adar link prediction on the co-purchase graph: the top-50
    * NON-adjacent part pairs by summed 1/ln(deg) over their common
    * neighbors — "which co-purchase edge is the graph about to grow"
    * (recommendation backfill / augmentation candidates). Per-apex
    * weights are integers fixed from integer degrees; everything after
    * is exact integer sums (see
    * [[graft.operators.GraphOps.linkPrediction]]). */
  val q218LinkPrediction: Q = (s, d) =>
    graft.operators.GraphOps.linkPrediction(coPurchaseEdges(s, d),
      "u", "v", topK = 50, maxApexDegree = 1000L)

  private val HllBits = 10
  private val SlideDays = 7

  /** Rolling 7-day distinct users from daily HLL register state — the
    * sliding-cardinality dashboard metric computed WITHOUT re-scanning
    * each window: one data pass builds (day, bucket) registers, the
    * roll is a range-window max over the control-plane-sized register
    * table, and the estimate is the dyadic-exact integer HLL formula
    * (the oracle replays every hash and register bit). */
  val q135SlidingDistinct: Q = (s, d) =>
    graft.operators.Sketches.slidingDistinct(
      EtlQueries.events(s, d).select(
        unix_date(to_date(col("ts"))).cast("long").as("day"), col("user_id")),
      "day", "user_id", HllBits, SlideDays)

  /** Per-nation revenue trend: daily order revenue in exact cents,
    * then [[graft.operators.TimeOps.trendFit]]'s integer OLS — slope
    * and first-day intercept in ppm, identical on any cluster size
    * (the oracle replays the same rational arithmetic in HUGEINT). */
  val q136RevenueTrend: Q = (s, d) => {
    val daily = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    graft.operators.TimeOps.trendFit(daily, "nation", "day", "cents")
  }

  private val PcaIters = 3

  /** Top principal direction of the embedding corpus by integer power
    * iteration — matrix-free `Σ xᵢ(xᵢ·v)` rounds with the direction as
    * a control-plane literal, bit-reproducible in the unrolled-CTE
    * oracle. */
  val q137PowerIteration: Q = (s, d) =>
    graft.operators.Pca.powerIteration(
      t(s, d, "embeddings"), "embedding", dim = 64, iters = PcaIters)

  private val BinPcts = Seq(25, 50, 75)

  /** Quantile discretization end-to-end: exact global quartiles of
    * l_extendedprice by histogram-refine selection (no global sort),
    * then a shuffle-free literal-cut binning and one aggregate —
    * item counts and exact-decimal revenue per price-quartile bin. */
  val q138QuantileBins: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val cuts = graft.operators.Quantiles.exactGlobalPercentiles(
        li, "l_extendedprice", BinPcts, buckets = 64, directThreshold = 5000L)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    graft.operators.Quantiles.binByCuts(li, "l_extendedprice",
        BinPcts.map(cuts))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("bin")
  }

  /** Majority-vote label consolidation: per part, the winning return
    * flag across its lineitems with exact agreement ppm — struct-min
    * winner, no window sort. */
  val q139MajorityVote: Q = (s, d) =>
    graft.operators.LabelOps.majorityVote(
      t(s, d, "lineitem"), "l_partkey", "l_returnflag")

  /** Reliability-weighted label consolidation (one integer
    * Dawid–Skene round): suppliers "annotate" their parts with return
    * flags; annotators are scored by agreement with the majority and
    * the vote re-runs weighted. */
  val q140WeightedVote: Q = (s, d) =>
    graft.operators.LabelOps.reliabilityWeightedVote(
      t(s, d, "lineitem"), "l_partkey", "l_suppkey", "l_returnflag")

  /** RFM segmentation: per-customer recency / frequency / monetary,
    * each quintile-binned by its own EXACT global percentiles
    * (histogram-refine selection — no global sort), customers counted
    * per segment cell. The three cut sets are control-plane literals;
    * scoring is one shuffle-free projection over the customer
    * aggregate. */
  val q141RfmSegments: Q = (s, d) => {
    import graft.operators.Quantiles
    val cust = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(unix_date(to_date(col("o_orderdate")))).cast("double").as("r"),
        count(lit(1)).cast("double").as("f"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").cast("double").as("m"))
      .transform(graft.operators.Materialize.once)
    def cuts(c: String): Seq[Double] =
      Quantiles.exactGlobalPercentiles(cust, c, Seq(20, 40, 60, 80),
        buckets = 64, directThreshold = 5000L)
        .collect().map(_.getDouble(1)).toSeq
    val scored = Seq("r", "f", "m").foldLeft(cust) { (df, c) =>
      Quantiles.binByCuts(df, c, cuts(c)).withColumnRenamed("bin", s"${c}_score")
    }
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val ZipfTop = 500

  /** Corpus Zipf fit: ln-ln regression of term frequency against
    * frequency rank over the top-500 vocabulary — the slope is the
    * Zipf exponent (≈ −1 for natural text), a one-row corpus health
    * metric. Composes [[graft.operators.Vocab.build]]'s distributed
    * top-k term counts with [[graft.operators.TimeOps.trendFit]]'s
    * integer OLS; the only float step is ln of an integer, floor-
    * quantized to ppm (the q47/q81/q113 logarithm rule). */
  val q142ZipfFit: Q = (s, d) => {
    val v = graft.operators.Vocab.build(t(s, d, "documents"), "text", ZipfTop)
    val pts = v.select(lit("corpus").as("corpus"),
      floor(log((col("token_id") + 1).cast("double")) * 1e6).cast("long").as("ln_rank"),
      floor(log(col("freq").cast("double")) * 1e6).cast("long").as("ln_freq"))
    graft.operators.TimeOps.trendFit(pts, "corpus", "ln_rank", "ln_freq")
  }

  private val EwmaAlphaDen = 4
  private val EwmaThreshold = 300000000L // 3M dollars in cents

  /** EWMA control chart over monthly per-nation revenue: integer
    * exponential smoothing (α = 1/4) with a deviation flag, replayed
    * by the oracle as a recursive CTE — the sequential recurrence runs
    * array-side after one key shuffle. */
  val q143EwmaChart: Q = (s, d) => {
    val monthly = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        ((year(to_date(col("o_orderdate"))) - 1970) * 12 +
          month(to_date(col("o_orderdate"))) - 1).cast("long").as("mon"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    graft.operators.TimeOps.ewmaChart(monthly, "nation", "mon", "cents",
      EwmaAlphaDen, EwmaThreshold)
  }

  private val HoltAlphaDen = 4
  private val HoltBetaDen = 5

  /** Holt linear (level+trend) forecast chart over the same monthly
    * per-nation revenue series as q143 — the trend-aware upgrade of
    * the EWMA chart (see [[graft.operators.TimeOps.holtChart]]). */
  val q172HoltChart: Q = (s, d) => {
    val monthly = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        ((year(to_date(col("o_orderdate"))) - 1970) * 12 +
          month(to_date(col("o_orderdate"))) - 1).cast("long").as("mon"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    graft.operators.TimeOps.holtChart(monthly, "nation", "mon", "cents",
      HoltAlphaDen, HoltBetaDen)
  }

  private val NeighborK = 5

  /** "Bought together" item neighbors: top-5 Jaccard-similar brands
    * per brand from order co-occurrence — the collaborative-filtering
    * item-item primitive, with the bounded-heap TopKPerKey node in
    * place of a per-item window sort. */
  val q144ItemNeighbors: Q = (s, d) => {
    val baskets = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
    graft.operators.Association.itemNeighbors(
      baskets, "basket", "item", BasketMinSupport, NeighborK)
  }

  /** ROLLUP revenue cube: (nation, year) detail plus per-nation and
    * grand-total marginals in ONE pass — Spark's Expand feeds a single
    * partial-aggregated shuffle, so the three grouping levels cost one
    * scan instead of three. Exact decimal money sums (the dsum rule);
    * grouping_id distinguishes rollup NULLs from data NULLs. Sort
    * leads with gid so NULL-ordering differences between engines can
    * never reach the comparator.
    *
    * Expressed in Spark SQL: the equivalent DataFrame-API chain
    * (rollup + agg over a join) trips DetectAmbiguousSelfJoin on the
    * Expand's duplicated grouping attributes (Spark 4.1), while the
    * SQL path plans the identical Expand → partial-agg → shuffle. */
  val q148RollupRevenue: Q = (s, d) => s.sql(
    s"""WITH j AS (
       |  SELECT /*+ BROADCAST(n) */ n_name,
       |         CAST(year(o_orderdate) AS BIGINT) AS yr, o_totalprice
       |  FROM parquet.`$d/orders.parquet` o
       |  JOIN parquet.`$d/customer.parquet` c ON o.o_custkey = c.c_custkey
       |  JOIN parquet.`$d/nation.parquet` n ON c.c_nationkey = n.n_nationkey)
       |SELECT n_name, yr,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       |  count(*) AS n_orders,
       |  CAST(grouping_id(n_name, yr) AS BIGINT) AS gid
       |FROM j GROUP BY ROLLUP(n_name, yr)
       |ORDER BY gid, n_name, yr""".stripMargin)

  /** CUBE order counts: all four grouping levels of
    * (priority, status) — detail, both one-dimension marginals, grand
    * total — in one Expand pass; the CUBE twin of q148's ROLLUP. */
  val q149CubeOrders: Q = (s, d) => s.sql(
    s"""SELECT o_orderpriority, o_orderstatus,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       |  count(*) AS n_orders,
       |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
       |FROM parquet.`$d/orders.parquet`
       |GROUP BY CUBE(o_orderpriority, o_orderstatus)
       |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin)

  /** Bootstrap 95% CI for mean order value per priority class:
    * 200 deterministic hash-Poisson replicates, quantized integer
    * replicate means, rank-selected endpoints — the uncertainty
    * quantification a metrics pipeline attaches to every dashboard
    * number, engine-exact (see [[graft.operators.Bootstrap]]). */
  val q151BootstrapCi: Q = (s, d) =>
    graft.operators.Bootstrap.groupMeanCi(
      t(s, d, "orders").select(col("o_orderpriority").as("grp"),
        col("o_orderkey").as("id"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents")),
      "grp", "id", "cents", reps = 200, loRank = 5, hiRank = 195)
      .orderBy("grp")

  private val AttributionTouches = Seq("view", "click", "signup")
  private val AttributionLookbackUs = 24L * 3600 * 1000000 // 24 h

  /** Multi-touch attribution over the events stream: purchase value
    * credited to the view/click/signup touches of the preceding 24 h
    * under first-touch, last-touch and linear models at once. One
    * user-keyed shuffle (see [[graft.operators.Attribution]]). */
  val q153Attribution: Q = (s, d) =>
    graft.operators.Attribution.multiTouch(t(s, d, "events"),
      "user_id", "ts", "event_type", "event_id", "value",
      AttributionTouches, "purchase", AttributionLookbackUs)

  private val FunnelSteps = Seq("view", "click", "purchase")

  /** Ordered view → click → purchase funnel: greedy earliest-
    * completion chain folded ARRAY-SIDE per user — one shuffle for
    * any number of steps (see [[graft.operators.Funnel]]). */
  val q154FunnelSteps: Q = (s, d) =>
    graft.operators.Funnel.steps(t(s, d, "events"),
      "user_id", "ts", "event_type", "event_id", FunnelSteps)

  /** Robust outlier report per event type: median/MAD modified
    * z-score over integer cents — the outlier rule with 50% breakdown
    * (see [[graft.operators.Quantiles.madOutliers]]). Cents are
    * `floor(value·100)` on the IEEE double, identical per engine. */
  val q160MadOutliers: Q = (s, d) =>
    graft.operators.Quantiles.madOutliers(
      t(s, d, "events").select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents")),
      Seq("event_type"), "cents")

  private val EntryPathLen = 5
  private val EntryPathTopK = 20

  /** Entry-path mining: each user's first five event types as an
    * ordered '>' -joined path, counted across users — the "how do
    * sessions begin" product-analytics staple. One user shuffle
    * (array-side sort + slice), one path count; ties break by path
    * string so the top-k is total-ordered. */
  val q163EntryPaths: Q = (s, d) =>
    t(s, d, "events")
      .groupBy("user_id")
      .agg(slice(sort_array(collect_list(struct(
        unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type").as("typ")))), 1, EntryPathLen).as("head5"))
      .select(array_join(expr("transform(head5, x -> x.typ)"), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(EntryPathTopK)

  private val AcfMaxLag = 14

  /** Autocorrelation of the daily-revenue series at lags 1..14 — the
    * weekly-seasonality probe, exact mean-free integer arithmetic
    * (see [[graft.operators.TimeOps.acf]]). The row_number index
    * window runs on the AGGREGATED series (calendar-bounded rows),
    * not the fact table. */
  val q164Acf: Q = (s, d) => {
    val daily = t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    val series = daily.withColumn("t",
      row_number().over(Window.orderBy("day")))
    graft.operators.TimeOps.acf(series, "t", "cents", maxLag = AcfMaxLag)
  }

  /** Winsorized vs raw mean of event value cents per event type
    * (clamp at the exact p5/p95 rank cuts) — the tail-robust KPI
    * estimator (see [[graft.operators.Quantiles.winsorizedMean]]). */
  val q166Winsorized: Q = (s, d) =>
    graft.operators.Quantiles.winsorizedMean(
      t(s, d, "events").select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents")),
      Seq("event_type"), "cents", loPct = 5, hiPct = 95)

  private val DailyRevenueSeriesSql =
    """SELECT row_number() OVER (ORDER BY day) AS t, cents AS x
      |FROM (SELECT CAST(o_orderdate AS DATE) AS day,
      |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |          AS cents
      |      FROM orders GROUP BY 1)""".stripMargin

  private def dailyRevenueSeries(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    daily.withColumn("t", row_number().over(Window.orderBy("day")))
  }

  /** Data-driven changepoint score unit (the fitted-model holder
    * pattern): a fixed unit that fits sf0.1 overflows the score long
    * at 10x the revenue — resolve the smallest safe unit per
    * (JVM, dir) and render IT into the oracle. */
  private[queries] object ChangepointUnit {
    val MinUnit = 1000000L
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile private[queries] var last: Long = MinUnit
    def getOrResolve(s: SparkSession, d: String): Long = {
      val u = cache.computeIfAbsent(d, _ =>
        graft.operators.TimeOps.changepointAutoUnit(
          dailyRevenueSeries(s, d), "cents", MinUnit))
      last = u
      u
    }
  }

  /** Best single changepoint of the daily-revenue series by exact
    * two-segment least squares; the score unit auto-scales to the
    * series so the exact-rational argmax survives any sf (see
    * [[graft.operators.TimeOps.changepoint]]). */
  val q168Changepoint: Q = (s, d) =>
    graft.operators.TimeOps.changepoint(dailyRevenueSeries(s, d), "t", "cents",
      scoreUnit = ChangepointUnit.getOrResolve(s, d))

  /** Benford first-digit audit of order totals (in cents): observed
    * leading-digit distribution vs the Benford expectation, deviation
    * in ppm — the classic fabricated-numbers screen. Pure projection
    * + one 9-group aggregate; the expectation is a fixed integer
    * literal table (floor(10⁶·log₁₀(1+1/d))), identical per engine. */
  val q169Benford: Q = (s, d) => {
    val benford = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val cases = benford.zipWithIndex
      .map { case (p, i) => (i + 1).toString -> p }
      .foldRight(lit(null).cast("long")) { case ((d, p), rest) =>
        when(col("digit") === d, lit(p)).otherwise(rest)
      }
    t(s, d, "orders")
      .select(substring((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("obs_ppm",
        expr("(n * 1000000) div sum(n) over ()"))
      .withColumn("benford_ppm", cases)
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .select("digit", "n", "obs_ppm", "benford_ppm", "dev_ppm")
      .orderBy("digit")
  }

  private val ConformalSplits = Seq("cal" -> 0.5, "test" -> 0.5)
  private val ConformalSeed = 23
  private val ConformalAlphaPct = 10

  /** Split-conformal prediction-interval audit per order priority:
    * predictor = the calibration slice's exact median order value,
    * q̂ = the ceil((n+1)·0.9)-th smallest |y − ŷ| on calibration,
    * realized test coverage in ppm (should sit near 900 000) — the
    * distribution-free reliability check; see
    * [[graft.operators.Conformal.splitConformal]]. */
  val q242Conformal: Q = (s, d) => {
    val base = t(s, d, "orders").select(
      col("o_orderpriority").as("grp"), col("o_orderkey"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("y"))
    val sp = graft.operators.Sampling.assignSplit(
      base, "o_orderkey", ConformalSplits, ConformalSeed)
    val med = graft.operators.Quantiles.exactPercentiles(
      sp.filter(col("split") === "cal"), Seq("grp"), "y", Seq(50))
      .select(col("grp"), col("pct_value").as("yhat"))
    graft.operators.Conformal.splitConformal(
      sp.join(med, Seq("grp")).select(col("grp"), col("y"), col("yhat"),
        (col("split") === "cal").as("cal")),
      Seq("grp"), "y", "yhat", "cal", ConformalAlphaPct)
      .orderBy("grp")
  }

  /** Additive seasonal decomposition (period 7) of zero-filled daily
    * 1995 order revenue: centered moving-average trend, phase-mean
    * seasonal, exact residual closure — all floor-quantized integers;
    * see [[graft.operators.TimeOps.seasonalDecompose]]. */
  val q243Seasonal: Q = (s, d) => {
    val daily = t(s, d, "orders")
      .filter(year(to_date(col("o_orderdate"))) === 1995)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("t"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("v"))
    val span = daily.agg(min(col("t")), max(col("t"))).head()
    val spine = daily.sparkSession.range(span.getLong(0), span.getLong(1) + 1)
      .select(col("id").as("t"))
    val filled = spine.join(daily, Seq("t"), "left")
      .select(col("t"), coalesce(col("v"), lit(0L)).as("v"))
    graft.operators.TimeOps.seasonalDecompose(filled, "t", "v", period = 7)
      .orderBy("t")
  }

  /** Leave-one-out smoothed target encoding of the customer market
    * segment against order value — the high-cardinality-categorical
    * feature-engineering move, leakage-free by construction (own row
    * excluded, m = 20 pseudo-observations of the global prior); see
    * [[graft.operators.Encoding.targetEncodeLoo]]. */
  val q245TargetEncode: Q = (s, d) =>
    graft.operators.Encoding.targetEncodeLoo(
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey").as("id"), col("c_mktsegment").as("cat"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("y")),
      "id", "cat", "y")
      .orderBy("id")

  /** One-sided CUSUM drift chart over the daily order-count series —
    * the sequential change detector, closed-form via the prefix/
    * reflection identity so nothing is iterative; ref/slack/threshold
    * derive from the series by exact integer arithmetic both engines
    * repeat (see [[graft.operators.TimeOps.cusum]]). */
  val q248Cusum: Q = (s, d) => {
    val daily = t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("t"))
      .agg(count(lit(1)).cast("long").as("x"))
    val st = daily.agg(count(lit(1)), sum(col("x"))).head()
    val ref = st.getLong(1) / st.getLong(0) // positive: / == floor div
    graft.operators.TimeOps.cusum(daily, "t", "x",
        ref = ref, slack = ref / 20, threshold = 2 * ref)
      .orderBy("t")
  }

  /** Revenue-concentration audit across customers: exact Gini, HHI and
    * top-1 share over per-customer revenue cents — the skew report a
    * mixture pipeline reads before capping a dominant source (see
    * [[graft.operators.Inequality.concentration]]). */
  val q249Gini: Q = (s, d) =>
    graft.operators.Inequality.concentration(
      t(s, d, "orders").select(col("o_custkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("x")),
      "k", "x")

  val queries: Map[String, Q] = Map(
    "q248_cusum" -> q248Cusum,
    "q249_gini" -> q249Gini,
    "q242_conformal" -> q242Conformal,
    "q243_seasonal" -> q243Seasonal,
    "q245_target_encode" -> q245TargetEncode,
    "q172_holt_chart" -> q172HoltChart,
    "q168_changepoint" -> q168Changepoint,
    "q169_benford" -> q169Benford,
    "q166_winsorized" -> q166Winsorized,
    "q163_entry_paths" -> q163EntryPaths,
    "q164_acf" -> q164Acf,
    "q153_attribution" -> q153Attribution,
    "q154_funnel_steps" -> q154FunnelSteps,
    "q160_mad_outliers" -> q160MadOutliers,
    "q144_item_neighbors" -> q144ItemNeighbors,
    "q148_rollup_revenue" -> q148RollupRevenue,
    "q149_cube_orders" -> q149CubeOrders,
    "q151_bootstrap_ci" -> q151BootstrapCi,
    "q142_zipf_fit" -> q142ZipfFit,
    "q143_ewma_chart" -> q143EwmaChart,
    "q132_basket_rules" -> q132BasketRules,
    "q133_overlap_pairs" -> q133OverlapPairs,
    "q134_triangles" -> q134Triangles,
    "q218_link_prediction" -> q218LinkPrediction,
    "q135_sliding_distinct" -> q135SlidingDistinct,
    "q136_revenue_trend" -> q136RevenueTrend,
    "q137_power_iteration" -> q137PowerIteration,
    "q138_quantile_bins" -> q138QuantileBins,
    "q139_majority_vote" -> q139MajorityVote,
    "q140_weighted_vote" -> q140WeightedVote,
    "q141_rfm_segments" -> q141RfmSegments,
  )

  def oracles: Map[String, String] = staticOracles +
    ("q168_changepoint" -> graft.operators.TimeOps.changepointOracleSql(
      DailyRevenueSeriesSql, scoreUnit = ChangepointUnit.last))

  private val staticOracles: Map[String, String] = Map(
    "q248_cusum" -> graft.operators.TimeOps.cusumOracleSql(
      "SELECT CAST(o_orderdate AS DATE) AS t, count(*) AS x FROM orders GROUP BY 1",
      refSql = "SELECT sum(x) // count(*) FROM src",
      slackSql = "SELECT (sum(x) // count(*)) // 20 FROM src",
      thresholdSql = "SELECT 2 * (sum(x) // count(*)) FROM src"),
    "q249_gini" -> graft.operators.Inequality.concentrationOracleSql(
      """SELECT o_custkey AS k,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |FROM orders""".stripMargin),
    "q245_target_encode" -> graft.operators.Encoding.targetEncodeLooOracleSql(
      """SELECT o_orderkey AS id, c_mktsegment AS cat,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
      "id", "cat", "y"),
    "q242_conformal" -> {
      val splitCase = graft.operators.Sampling.assignSplitCaseSql(
        TextQueries.hx(s"'$ConformalSeed:' || CAST(o_orderkey AS VARCHAR)"),
        ConformalSplits)
      graft.operators.Conformal.splitConformalOracleSql(
        s"""WITH base AS (SELECT o_orderpriority AS grp, o_orderkey,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           |  FROM orders),
           |sp AS (SELECT grp, y, $splitCase AS split FROM base),
           |med AS (SELECT grp, y AS yhat FROM (
           |    SELECT grp, y, row_number() OVER (PARTITION BY grp ORDER BY y) AS rn,
           |      count(*) OVER (PARTITION BY grp) AS n
           |    FROM sp WHERE split = 'cal')
           |  WHERE rn = greatest(1, (n * 50 + 99) // 100))
           |SELECT grp, y, yhat, split = 'cal' AS cal
           |FROM sp JOIN med USING (grp)""".stripMargin,
        Seq("grp"), ConformalAlphaPct)
    },
    "q243_seasonal" -> graft.operators.TimeOps.seasonalDecomposeOracleSql(
      """WITH daily AS (SELECT
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS t,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS v
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(t) FROM daily), (SELECT max(t) FROM daily))) AS t)
        |SELECT spine.t, coalesce(v, 0) AS v
        |FROM spine LEFT JOIN daily USING (t)""".stripMargin,
      period = 7),
    "q172_holt_chart" -> {
      val k = 1000000000000L
      // inlined level/trend recurrence, mirroring TimeOps.holtChart
      val ln = s"(r.level + r.trend + (((s.cents - (r.level + r.trend)) + $k * $HoltAlphaDen) // $HoltAlphaDen - $k))"
      s"""WITH RECURSIVE monthly AS (
         |  SELECT n_name AS nation,
         |    CAST((year(CAST(o_orderdate AS DATE)) - 1970) * 12
         |         + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mon,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |              JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2),
         |ser AS (SELECT nation, mon, cents,
         |          row_number() OVER (PARTITION BY nation ORDER BY mon) AS rn
         |        FROM monthly),
         |rec AS (
         |  SELECT nation, mon, cents, rn, cents AS forecast,
         |         cents AS level, CAST(0 AS BIGINT) AS trend
         |  FROM ser WHERE rn = 1
         |  UNION ALL
         |  SELECT s.nation, s.mon, s.cents, s.rn,
         |    r.level + r.trend,
         |    $ln,
         |    r.trend + (((($ln - r.level) - r.trend) + $k * $HoltBetaDen)
         |               // $HoltBetaDen - $k)
         |  FROM ser s JOIN rec r ON s.nation = r.nation AND s.rn = r.rn + 1)
         |SELECT nation, mon, cents, forecast, level, trend,
         |       cents - forecast AS err
         |FROM rec ORDER BY nation, mon""".stripMargin
    },

    "q169_benford" -> {
      val benford = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
        66946L, 57991L, 51152L, 45757L)
      val caseSql = benford.zipWithIndex
        .map { case (p, i) => s"WHEN '${i + 1}' THEN $p" }
        .mkString("CASE digit ", " ", " ELSE NULL END")
      s"""WITH d AS (SELECT substr(CAST(CAST(
         |    CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS VARCHAR), 1, 1) AS digit FROM orders),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
         |SELECT digit, n,
         |  CAST((n * 1000000) // (SELECT sum(n) FROM g) AS BIGINT) AS obs_ppm,
         |  CAST($caseSql AS BIGINT) AS benford_ppm,
         |  CAST(abs((n * 1000000) // (SELECT sum(n) FROM g)
         |    - $caseSql) AS BIGINT) AS dev_ppm
         |FROM g ORDER BY digit""".stripMargin
    },
    "q166_winsorized" -> graft.operators.Quantiles.winsorizedMeanOracleSql(
      "SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events",
      Seq("event_type"), loPct = 5, hiPct = 95),
    "q163_entry_paths" ->
      s"""WITH ranked AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
         |  FROM events),
         |paths AS (
         |  SELECT user_id,
         |    string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM ranked WHERE rn <= $EntryPathLen GROUP BY user_id)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_users
         |FROM paths GROUP BY path
         |ORDER BY n_users DESC, path LIMIT $EntryPathTopK""".stripMargin,
    "q164_acf" -> graft.operators.TimeOps.acfOracleSql(
      """SELECT row_number() OVER (ORDER BY day) AS t, cents AS x
        |FROM (SELECT CAST(o_orderdate AS DATE) AS day,
        |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |          AS cents
        |      FROM orders GROUP BY 1)""".stripMargin, maxLag = 14),
    "q153_attribution" -> graft.operators.Attribution.multiTouchOracleSql(
      "SELECT * FROM events", AttributionTouches, "purchase",
      AttributionLookbackUs),
    "q154_funnel_steps" -> graft.operators.Funnel.stepsOracleSql(
      "SELECT * FROM events", FunnelSteps),
    "q160_mad_outliers" -> graft.operators.Quantiles.madOutliersOracleSql(
      "SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events",
      Seq("event_type")),
    "q151_bootstrap_ci" -> {
      val h = TextQueries.hx("CAST(b.id AS VARCHAR)")
      val u = graft.operators.Bootstrap.uniformSql("b.h", "r.rep")
      val w = graft.operators.Bootstrap.poissonWSql("u")
      val p = graft.operators.Bootstrap.P
      s"""WITH base0 AS (SELECT o_orderpriority AS grp, o_orderkey AS id,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders),
         |base AS (SELECT grp, id, cents, $h % $p AS h FROM base0 b),
         |pt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  (1000000 * CAST(sum(cents) AS BIGINT)) // CAST(count(*) AS BIGINT)
         |    AS mean_q
         |  FROM base GROUP BY grp),
         |reps AS (SELECT unnest(range(0, 200)) AS rep),
         |draw AS (SELECT b.grp, r.rep, b.cents, $u AS u
         |         FROM base b CROSS JOIN reps r),
         |wtab AS (SELECT grp, rep, cents, $w AS w FROM draw),
         |rm AS (SELECT grp, rep,
         |  (1000000 * CAST(sum(w * cents) AS BIGINT)) // CAST(sum(w) AS BIGINT)
         |    AS m
         |  FROM wtab WHERE w > 0 GROUP BY grp, rep),
         |rk AS (SELECT grp, rep, m, row_number() OVER (
         |         PARTITION BY grp ORDER BY m, rep) AS rn FROM rm)
         |SELECT pt.grp, pt.n, pt.mean_q,
         |  max(CASE WHEN rk.rn = 5 THEN rk.m END) AS lo_q,
         |  max(CASE WHEN rk.rn = 195 THEN rk.m END) AS hi_q
         |FROM pt JOIN rk USING (grp)
         |GROUP BY pt.grp, pt.n, pt.mean_q
         |ORDER BY pt.grp""".stripMargin
    },
    "q148_rollup_revenue" ->
      """WITH j AS (SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |             o_totalprice
        |           FROM orders
        |           JOIN customer ON o_custkey = c_custkey
        |           JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, yr,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders,
        |  CAST(GROUPING(n_name, yr) AS BIGINT) AS gid
        |FROM j GROUP BY ROLLUP(n_name, yr)
        |ORDER BY gid, n_name, yr""".stripMargin,
    "q149_cube_orders" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin,
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
    "q218_link_prediction" -> graft.operators.GraphOps.linkPredictionOracleSql(
      """SELECT a.pk AS u, b.pk AS v
        |FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem) a
        |JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem) b
        |  ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
      topK = 50, maxApexDegree = 1000L),
    // triangles enumerated canonically as a<b<c over u<v edges — the
    // orientation-invariant count triangleStats produces
    "q134_triangles" ->
      """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM pe a JOIN pe b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS d
        |        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |tri AS (SELECT count(*) AS t
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |ns AS (SELECT count(*) AS n_nodes,
        |              CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |ms AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, n_wedges, t AS n_triangles,
        |  CASE WHEN n_wedges = 0 THEN 0
        |       ELSE CAST((3000000 * CAST(t AS HUGEINT)) // n_wedges AS BIGINT)
        |  END AS clustering_ppm
        |FROM ns CROSS JOIN ms CROSS JOIN tri""".stripMargin,
    // bit-exact register replay (q78's hash contract) + range-window
    // roll + the q82 estimate formula
    "q135_sliding_distinct" -> {
      val m = 1 << HllBits
      val am2 = s"0.7213 / (1.0 + 1.079 / $m) * $m * $m"
      s"""WITH ev AS (SELECT date_diff('day', DATE '1970-01-01',
         |    CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day, user_id FROM events),
         |h AS (SELECT day,
         |  CAST(CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h
         |  FROM ev WHERE user_id IS NOT NULL),
         |daily AS (SELECT day, h % $m AS bucket,
         |  max(CASE WHEN h // $m = 0 THEN ${60 - HllBits + 1}
         |    ELSE ${60 - HllBits + 1} - length(bin(h // $m)) END) AS r
         |  FROM h GROUP BY 1, 2),
         |spine AS (SELECT day, b AS bucket FROM (SELECT DISTINCT day FROM ev)
         |  CROSS JOIN (SELECT unnest(range(0, $m)) AS b)),
         |dense AS (SELECT s.day, s.bucket, coalesce(d.r, 0) AS r
         |  FROM spine s LEFT JOIN daily d ON s.day = d.day AND s.bucket = d.bucket),
         |rolled AS (SELECT day, bucket, max(r) OVER (PARTITION BY bucket
         |  ORDER BY day RANGE BETWEEN ${SlideDays - 1} PRECEDING AND CURRENT ROW) AS rw
         |  FROM dense),
         |z AS (SELECT day, sum(CASE WHEN rw > 0 THEN 1 ELSE 0 END) AS present,
         |  coalesce(sum(CASE WHEN rw > 0 THEN pow(2.0, -rw) END), 0.0) AS zsum
         |  FROM rolled GROUP BY 1)
         |SELECT day,
         |  CASE WHEN $am2 / (($m.0 - present) + zsum) <= ${2.5 * m}
         |        AND ($m - present) > 0
         |    THEN CAST(floor($m.0 * ln($m.0 / ($m - present))) AS BIGINT)
         |    ELSE CAST(floor($am2 / (($m.0 - present) + zsum)) AS BIGINT)
         |  END AS distinct_est
         |FROM z ORDER BY day""".stripMargin
    },
    // HUGEINT replay of trendFit's rational arithmetic; the positive
    // shift makes // (floor) agree with Spark's div (trunc)
    "q136_revenue_trend" ->
      """WITH daily AS (SELECT n_name AS nation,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |reb AS (SELECT nation, CAST(day - (SELECT min(day) FROM daily) AS HUGEINT) AS x,
        |               CAST(cents AS HUGEINT) AS y FROM daily),
        |st AS (SELECT nation, count(*) AS n_points, sum(x) AS sx, sum(y) AS sy,
        |              sum(x * y) AS sxy, sum(x * x) AS sxx
        |       FROM reb GROUP BY 1),
        |nd AS (SELECT nation, n_points,
        |         CAST(n_points AS HUGEINT) * sxy - sx * sy AS num_s,
        |         sy * sxx - sx * sxy AS num_i,
        |         CAST(n_points AS HUGEINT) * sxx - sx * sx AS den
        |       FROM st)
        |SELECT nation, n_points,
        |  CASE WHEN den = 0 THEN NULL ELSE
        |    CAST((1000000 * num_s + 1000000000000 * den) // den
        |         - 1000000000000 AS BIGINT) END AS slope_ppm,
        |  CASE WHEN den = 0 THEN NULL ELSE
        |    CAST((1000000 * num_i + 1000000000000000000 * den) // den
        |         - 1000000000000000000 AS BIGINT) END AS intercept_ppm
        |FROM nd ORDER BY nation""".stripMargin,
    "q137_power_iteration" -> graft.operators.Pca.powerIterationOracleSql(
      "SELECT list_transform(CAST(embedding AS DOUBLE[]), " +
        "x -> CAST(floor(x * 1000.0) AS BIGINT)) AS qv FROM embeddings",
      dim = 64, iters = PcaIters),
    // cuts by the shared rank rule (value AT rank max(1, ceil(n·p/100)));
    // bin = #cuts strictly below the value
    "q138_quantile_bins" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
        |n AS (SELECT count(*) AS n FROM v),
        |ranked AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
        |cuts AS (SELECT
        |    max(CASE WHEN rn = greatest(1, (n.n * 25 + 99) // 100) THEN x END) AS c25,
        |    max(CASE WHEN rn = greatest(1, (n.n * 50 + 99) // 100) THEN x END) AS c50,
        |    max(CASE WHEN rn = greatest(1, (n.n * 75 + 99) // 100) THEN x END) AS c75
        |  FROM ranked CROSS JOIN n)
        |SELECT (CASE WHEN x > c25 THEN 1 ELSE 0 END
        |      + CASE WHEN x > c50 THEN 1 ELSE 0 END
        |      + CASE WHEN x > c75 THEN 1 ELSE 0 END) AS bin,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM v CROSS JOIN cuts GROUP BY 1 ORDER BY 1""".stripMargin,
    "q139_majority_vote" ->
      """WITH c AS (SELECT l_partkey, l_returnflag AS label, count(*) AS votes
        |           FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT l_partkey, CAST(sum(votes) AS BIGINT) AS total_votes,
        |             count(*) AS n_labels FROM c GROUP BY 1),
        |w AS (SELECT l_partkey, label, votes,
        |        row_number() OVER (PARTITION BY l_partkey
        |                           ORDER BY votes DESC, label) AS rn FROM c)
        |SELECT w.l_partkey, w.label, votes, total_votes, n_labels,
        |  CAST((1000000 * CAST(votes AS HUGEINT)) // total_votes AS BIGINT)
        |    AS agreement_ppm
        |FROM w JOIN t USING (l_partkey) WHERE rn = 1
        |ORDER BY w.l_partkey""".stripMargin,
    "q140_weighted_vote" ->
      """WITH v AS (SELECT l_partkey AS k, l_suppkey AS a, l_returnflag AS l
        |           FROM lineitem),
        |c AS (SELECT k, l, count(*) AS votes FROM v GROUP BY 1, 2),
        |maj AS (SELECT k, l AS maj FROM (SELECT k, l, row_number() OVER
        |          (PARTITION BY k ORDER BY votes DESC, l) AS rn FROM c)
        |        WHERE rn = 1),
        |rel AS (SELECT a, CAST((1000000 * CAST(sum(CASE WHEN l = maj THEN 1
        |            ELSE 0 END) AS HUGEINT)) // count(*) AS BIGINT) AS rel
        |        FROM v JOIN maj USING (k) GROUP BY 1),
        |wc AS (SELECT k, l, CAST(sum(rel) AS BIGINT) AS w, count(*) AS nv
        |       FROM v JOIN rel USING (a) GROUP BY 1, 2),
        |win AS (SELECT k, l, w, row_number() OVER (PARTITION BY k
        |          ORDER BY w DESC, l) AS rn FROM wc),
        |tot AS (SELECT k, CAST(sum(nv) AS BIGINT) AS n_voters FROM wc GROUP BY 1)
        |SELECT win.k AS l_partkey, win.l AS label, w AS weight_ppm, n_voters
        |FROM win JOIN tot USING (k) WHERE rn = 1 ORDER BY 1""".stripMargin,
    // three independent rank-rule quintile cut sets over the customer
    // aggregate, then strict-above binning — q138's contract per axis
    "q141_rfm_segments" ->
      """WITH cust AS (SELECT o_custkey,
        |    CAST(max(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE))) AS DOUBLE) AS r,
        |    CAST(count(*) AS DOUBLE) AS f,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS DOUBLE) AS m
        |  FROM orders GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM cust),
        |rr AS (SELECT r AS x, row_number() OVER (ORDER BY r) AS rn FROM cust),
        |rf AS (SELECT f AS x, row_number() OVER (ORDER BY f) AS rn FROM cust),
        |rm AS (SELECT m AS x, row_number() OVER (ORDER BY m) AS rn FROM cust),
        |cr AS (SELECT
        |    max(CASE WHEN rn = greatest(1, (n.n * 20 + 99) // 100) THEN x END) AS c1,
        |    max(CASE WHEN rn = greatest(1, (n.n * 40 + 99) // 100) THEN x END) AS c2,
        |    max(CASE WHEN rn = greatest(1, (n.n * 60 + 99) // 100) THEN x END) AS c3,
        |    max(CASE WHEN rn = greatest(1, (n.n * 80 + 99) // 100) THEN x END) AS c4
        |  FROM rr CROSS JOIN n),
        |cf AS (SELECT
        |    max(CASE WHEN rn = greatest(1, (n.n * 20 + 99) // 100) THEN x END) AS c1,
        |    max(CASE WHEN rn = greatest(1, (n.n * 40 + 99) // 100) THEN x END) AS c2,
        |    max(CASE WHEN rn = greatest(1, (n.n * 60 + 99) // 100) THEN x END) AS c3,
        |    max(CASE WHEN rn = greatest(1, (n.n * 80 + 99) // 100) THEN x END) AS c4
        |  FROM rf CROSS JOIN n),
        |cm AS (SELECT
        |    max(CASE WHEN rn = greatest(1, (n.n * 20 + 99) // 100) THEN x END) AS c1,
        |    max(CASE WHEN rn = greatest(1, (n.n * 40 + 99) // 100) THEN x END) AS c2,
        |    max(CASE WHEN rn = greatest(1, (n.n * 60 + 99) // 100) THEN x END) AS c3,
        |    max(CASE WHEN rn = greatest(1, (n.n * 80 + 99) // 100) THEN x END) AS c4
        |  FROM rm CROSS JOIN n)
        |SELECT
        |  (CASE WHEN r > cr.c1 THEN 1 ELSE 0 END + CASE WHEN r > cr.c2 THEN 1 ELSE 0 END
        |   + CASE WHEN r > cr.c3 THEN 1 ELSE 0 END + CASE WHEN r > cr.c4 THEN 1 ELSE 0 END) AS r_score,
        |  (CASE WHEN f > cf.c1 THEN 1 ELSE 0 END + CASE WHEN f > cf.c2 THEN 1 ELSE 0 END
        |   + CASE WHEN f > cf.c3 THEN 1 ELSE 0 END + CASE WHEN f > cf.c4 THEN 1 ELSE 0 END) AS f_score,
        |  (CASE WHEN m > cm.c1 THEN 1 ELSE 0 END + CASE WHEN m > cm.c2 THEN 1 ELSE 0 END
        |   + CASE WHEN m > cm.c3 THEN 1 ELSE 0 END + CASE WHEN m > cm.c4 THEN 1 ELSE 0 END) AS m_score,
        |  count(*) AS n_customers
        |FROM cust CROSS JOIN cr CROSS JOIN cf CROSS JOIN cm
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // top-rank terms by the q67 vocab order; q136's HUGEINT OLS over
    // ppm-quantized logs
    "q142_zipf_fit" ->
      s"""WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM documents),
         |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
         |top AS (SELECT c, rn FROM (
         |    SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rn FROM freq)
         |  WHERE rn <= $ZipfTop),
         |pts AS (SELECT CAST(floor(1000000 * ln(rn)) AS HUGEINT) AS x0,
         |               CAST(floor(1000000 * ln(c)) AS HUGEINT) AS y FROM top),
         |reb AS (SELECT x0 - (SELECT min(x0) FROM pts) AS x, y FROM pts),
         |st AS (SELECT count(*) AS n_points, sum(x) AS sx, sum(y) AS sy,
         |              sum(x * y) AS sxy, sum(x * x) AS sxx FROM reb),
         |nd AS (SELECT n_points,
         |         CAST(n_points AS HUGEINT) * sxy - sx * sy AS num_s,
         |         sy * sxx - sx * sxy AS num_i,
         |         CAST(n_points AS HUGEINT) * sxx - sx * sx AS den
         |       FROM st)
         |SELECT 'corpus' AS corpus, n_points,
         |  CASE WHEN den = 0 THEN NULL ELSE
         |    CAST((1000000 * num_s + 1000000000000 * den) // den
         |         - 1000000000000 AS BIGINT) END AS slope_ppm,
         |  CASE WHEN den = 0 THEN NULL ELSE
         |    CAST((1000000 * num_i + 1000000000000000000 * den) // den
         |         - 1000000000000000000 AS BIGINT) END AS intercept_ppm
         |FROM nd""".stripMargin,
    // sequential integer recurrence replayed as a recursive CTE; the
    // shift keeps // (floor) == div (trunc) on negative deltas
    "q143_ewma_chart" ->
      s"""WITH RECURSIVE monthly AS (
         |  SELECT n_name AS nation,
         |    CAST((year(CAST(o_orderdate AS DATE)) - 1970) * 12
         |         + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mon,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |              JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2),
         |ser AS (SELECT nation, mon, cents,
         |          row_number() OVER (PARTITION BY nation ORDER BY mon) AS rn
         |        FROM monthly),
         |rec AS (
         |  SELECT nation, mon, cents, rn, cents AS ewma, 0 AS flag
         |  FROM ser WHERE rn = 1
         |  UNION ALL
         |  SELECT s.nation, s.mon, s.cents, s.rn,
         |    r.ewma + (((s.cents - r.ewma) + 1000000000000 * $EwmaAlphaDen)
         |              // $EwmaAlphaDen - 1000000000000),
         |    CASE WHEN abs(s.cents - r.ewma) > $EwmaThreshold THEN 1 ELSE 0 END
         |  FROM ser s JOIN rec r ON s.nation = r.nation AND s.rn = r.rn + 1)
         |SELECT nation, mon, cents, ewma, flag
         |FROM rec ORDER BY nation, mon""".stripMargin,
    "q144_item_neighbors" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS basket, p_brand AS item
         |           FROM lineitem JOIN part ON p_partkey = l_partkey),
         |ci AS (SELECT item, count(*) AS c FROM b GROUP BY 1),
         |cab AS (SELECT x.item AS item, y.item AS neighbor, count(*) AS cab
         |        FROM b x JOIN b y ON x.basket = y.basket AND x.item <> y.item
         |        GROUP BY 1, 2),
         |sc AS (SELECT cab.item AS item, cab.neighbor AS neighbor, cab.cab AS cab,
         |         ca.c AS ca, cb.c AS cb,
         |         CAST((1000000 * CAST(cab.cab AS HUGEINT))
         |              // (ca.c + cb.c - cab.cab) AS BIGINT) AS jaccard_ppm
         |       FROM cab JOIN ci ca ON ca.item = cab.item
         |                JOIN ci cb ON cb.item = cab.neighbor
         |       WHERE cab.cab >= $BasketMinSupport),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY item
         |         ORDER BY jaccard_ppm DESC, neighbor) AS rn FROM sc)
         |SELECT item, neighbor, cab, ca, cb, jaccard_ppm
         |FROM rk WHERE rn <= $NeighborK
         |ORDER BY item, jaccard_ppm DESC, neighbor""".stripMargin,
  )
}
