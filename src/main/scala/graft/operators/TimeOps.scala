package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series scaffolding: dense date spines for gap-free rollups and
  * burst collapsing for noisy event streams.
  *
  * Reference behavior: the reference's daily revenue reports simply
  * GROUP BY date (vivek-neenopal/shopify-etl report SQL), which
  * silently drops zero-activity days — downstream charting and
  * forecasting then misreads gaps as missing data. The spine join
  * makes absence explicit.
  */
object TimeOps {

  /** One row per calendar day spanning [min(tsCol), max(tsCol)] of
    * `df`, as a `day: date` column.
    *
    * Scale shape: the bounds are a full aggregate (one number per
    * side), the spine itself is `sequence()+explode` over a single
    * row — a few thousand rows per decade regardless of fact size.
    * The fact table is scanned once for min/max (parquet footer
    * min/max stats make that scan cheap).
    */
  def dateSpine(df: DataFrame, tsCol: String): DataFrame =
    df.agg(min(to_date(col(tsCol))).as("__lo"), max(to_date(col(tsCol))).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))

  /** Gap-filled daily rollup: aggregate `df` by day, then left-join
    * onto the dense spine so zero-activity days appear with the given
    * defaults instead of vanishing.
    *
    * The spine side is tiny (days) and broadcasts; the fact aggregates
    * once on the day key — same shuffle count as the naive GROUP BY.
    *
    * @param aggs     (resultName, aggColumn) pairs evaluated in the
    *                 day-grouped aggregate
    * @param defaults per-resultName value to use on gap days (missing
    *                 names stay NULL on gaps)
    */
  def gapFilledDaily(df: DataFrame, tsCol: String,
                     aggs: Seq[(String, Column)],
                     defaults: Map[String, Column]): DataFrame = {
    val rolled = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val filled = aggs.map { case (n, _) =>
      defaults.get(n).map(d => coalesce(col(n), d).as(n)).getOrElse(col(n))
    }
    broadcast(dateSpine(df, tsCol)).join(rolled, Seq("day"), "left")
      .select(col("day") +: filled: _*)
  }

  /** Flag values more than `k` standard deviations from the global
    * mean — the daily-metric anomaly gate — with EXACT integer/decimal
    * arithmetic, so the flags are bit-identical across engines and
    * partitionings. Float mean/stddev are summation-order-sensitive
    * and their division/sqrt round differently per engine; instead the
    * k-sigma test is the cross-multiplied inequality over a LONG value
    * column:
    *
    *   (x·n − S)² > k²·(n·Q − S²)
    *
    * (population variance both sides scaled by n²) where n, S = Σx and
    * Q = Σx² are exact decimal aggregates. q103's oracle replays the
    * identical inequality in HUGEINT SQL.
    *
    * The right-hand side can reach ~10⁵⁰ — past DECIMAL(38) AND
    * HUGEINT — so it is NOT evaluated per row. The three stats are one
    * control-plane row, collected and folded in driver-side BigInt
    * (unbounded), and the per-row test ships as the equivalent
    *
    *   |x·n − S| > isqrt(k²·(n·Q − S²))
    *
    * (exact for integer dev: dev² > R ⟺ |dev| > ⌊√R⌋), whose only
    * per-row intermediate is `x·n − S` ≤ 2·10²⁵ — comfortably inside
    * DECIMAL(38) under the magnitude contract |x| < 10¹⁵, n < 10¹⁰.
    * The Q = Σx² aggregate itself needs |x|²·n < 10³⁸ (e.g. any
    * |x| ≤ 10¹⁴ at n ≤ 10¹⁰); past that the decimal sum overflows to
    * NULL and this fails LOUDLY here instead of emitting NULL flags.
    *
    * Scale shape: one full aggregate (four control-plane numbers,
    * including a loud range check on the raw column) at call time,
    * then a pure literal projection — no join at all in the returned
    * plan. Rows with a NULL value are excluded from the stats and get
    * a NULL flag. EAGER: collecting the stats row runs a Spark job at
    * DataFrame-construction time.
    */
  def sigmaOutliers(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val x = col(valueCol).cast("decimal(15,0)")
    // range check on a 38-digit cast of the RAW column: a value past
    // 10^15 would overflow the working cast to NULL and silently drop
    // out of S and Q — fail loudly instead
    val row = df.agg(
      count(col(valueCol)).as("__n"),
      max(abs(col(valueCol).cast("decimal(38,0)"))).as("__m"),
      sum(x).as("__s"),
      sum(x * x).as("__q")).first()
    val n = row.getLong(0)
    if (n == 0) // no non-null values: nothing to deviate from
      return df.withColumn("is_outlier", lit(null).cast("boolean"))
    require(n < 10000000000L,
      s"sigmaOutliers: n=$n rows breaks the n < 10^10 magnitude contract")
    require(!row.isNullAt(1),
      s"sigmaOutliers: |$valueCol| exceeds DECIMAL(38) entirely")
    val maxAbs = BigInt(row.getDecimal(1).toBigInteger)
    require(maxAbs < BigInt(10).pow(15),
      s"sigmaOutliers: max|$valueCol|=$maxAbs breaks the |x| < 10^15 " +
        "magnitude contract")
    if (row.isNullAt(2) || row.isNullAt(3))
      throw new IllegalStateException(
        s"sigmaOutliers: stats over '$valueCol' overflowed DECIMAL(38) — " +
          "|x|^2*n must stay below 10^38 (e.g. any |x| <= 10^14 at n <= 10^10)")
    val s = BigInt(row.getDecimal(2).toBigInteger)
    val q = BigInt(row.getDecimal(3).toBigInteger)
    val rhs = BigInt(k) * k * (BigInt(n) * q - s * s)
    val thr = rhs.bigInteger.sqrt() // floor square root, exact
    df.withColumn("is_outlier",
      abs(x * lit(java.math.BigDecimal.valueOf(n)) -
        lit(new java.math.BigDecimal(s.bigInteger))) >
        lit(new java.math.BigDecimal(thr)))
  }

  /** Collapse event bursts: group each key's events into bursts —
    * maximal chains where consecutive events arrive within
    * `gapSeconds` of each other — and keep one row per burst (its
    * first event) annotated with `burst_size` and `burst_span_us`
    * (span in exact integer microseconds: epoch-micro longs, not
    * float epoch seconds, so the arithmetic is bit-identical across
    * engines and partitionings).
    *
    * This is the q18 sessionization trick pointed at deduplication:
    * a retried click, a double-fired webhook, or a chatty sensor
    * produces a burst; the collapsed stream keeps the burst's head
    * event plus enough metadata to audit what was dropped.
    *
    * Scale shape: two windows over the SAME (key, ts, tieBreak)
    * ordering — Spark plans one Exchange + one sort, per-row lag
    * state only. No self-join against the burst extent.
    */
  /** Per-key daily resample with last-observation-carried-forward —
    * the time-series regularization step (sparse sensor/event readings
    * → a dense per-key daily series) feeding forecasting or
    * feature-store pipelines.
    *
    * Days are INTEGER epoch-day indexes (`unix_micros div 86400e6`) —
    * no calendar/timezone semantics to diverge on. The fill is the
    * union-marker trick (the AsofJoin layout): observations and grid
    * markers interleave in one per-key window ordered by
    * (day, marker-last, ts, event-seq), and `last(value, ignoreNulls)`
    * carries the latest observation into each marker — ONE key
    * shuffle, no per-day join. A same-day observation lands before its
    * marker, so day D's row reflects everything through D.
    *
    * 100 TB shape: the day spine is a broadcast `spark.range`; the
    * grid is keys × days (emit only keys that exist). The window sorts
    * each key's (obs + days) rows once; keys parallelize.
    *
    * @return (keyCols…, day, value_ffill, last_obs_day) — one row per
    *         key per day in [min day, max day] of the input;
    *         value_ffill null until the key's first observation
    */
  def resampleFfill(df: DataFrame, keyCols: Seq[String], tsCol: String,
                    seqCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    val keys = keyCols.map(col)
    val e = df.select(keys ++ Seq(
      expr(s"unix_micros($tsCol) div 86400000000").as("day"),
      unix_micros(col(tsCol)).as("__us"),
      col(seqCol).cast("long").as("__seq"),
      col(valCol).as("__v")): _*)
      .transform(Materialize.once) // bounds + grid keys + obs all read it
    val boundsRow = e.agg(min("day"), max("day")).head()
    require(!boundsRow.isNullAt(0),
      "resampleFfill: input has no rows — nothing to grid")
    val (loD, hiD) = (boundsRow.getLong(0), boundsRow.getLong(1))
    val spine = spark.range(loD, hiD + 1).toDF("day")
    val grid = e.select(keys: _*).distinct()
      .crossJoin(broadcast(spine))
      .select(keys ++ Seq(col("day"),
        lit(Long.MaxValue).as("__us"), lit(Long.MaxValue).as("__seq"),
        lit(null).cast(df.schema(valCol).dataType).as("__v"),
        lit(1).as("__grid")): _*)
    val obs = e.withColumn("__grid", lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*)
      .orderBy(col("day"), col("__grid"), col("__us"), col("__seq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    obs.unionByName(grid)
      .withColumn("value_ffill", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("last_obs_day",
        last(when(col("__grid") === 0, col("day")), ignoreNulls = true).over(w))
      .filter(col("__grid") === 1)
      .select(keys ++ Seq(col("day"), col("value_ffill"), col("last_obs_day")): _*)
  }

  def collapseBursts(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     tieBreak: String, gapSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty && gapSeconds > 0, "need keys and a positive gap")
    val us = unix_micros(col(tsCol))
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val prevUs = lag(us, 1).over(byKey)
    val newBurst = when(
      prevUs.isNull || us - prevUs > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    val withBurst = df.withColumn("__burst", sum(newBurst).over(byKey))
    val byBurst = Window.partitionBy((keyCols :+ "__burst").map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val burstAll = Window.partitionBy((keyCols :+ "__burst").map(col): _*)
    withBurst
      .withColumn("__rn", row_number().over(byBurst))
      .withColumn("burst_size", count(lit(1)).over(burstAll))
      .withColumn("burst_span_us",
        max(us).over(burstAll) - min(us).over(burstAll))
      .filter(col("__rn") === 1)
      .drop("__rn", "__burst")
  }

  /** Integer EWMA control chart per key: exponential smoothing with
    * α = 1/alphaDen and a deviation flag, exact across engines.
    * {{{
    *   s₁ = x₁
    *   sₜ = sₜ₋₁ + floor((xₜ − sₜ₋₁) / alphaDen)
    *   flagₜ = 1 iff |xₜ − sₜ₋₁| > threshold   (t > 1)
    * }}}
    * The floor on a possibly-negative delta uses the positive-shift
    * identity (K = 10¹²), so truncating and flooring engines agree —
    * the same rule as [[trendFit]].
    *
    * The recurrence is inherently sequential, so it runs ARRAY-SIDE:
    * one shuffle to (key, sorted series), then a codegen'd
    * `aggregate` fold per key. Per-key state is the series itself —
    * suited to series of control-plane length (daily/monthly metrics,
    * ≲10⁵ points per key), NOT to per-key event firehoses; contract
    * |x| < 10¹² and series length < 10⁵ per key.
    *
    * @return (keyCol, xCol, valCol, ewma, flag) ordered by (key, x)
    */
  def ewmaChart(df: DataFrame, keyCol: String, xCol: String, valCol: String,
                alphaDen: Int, threshold: Long): DataFrame = {
    require(alphaDen >= 1, s"alphaDen must be >= 1: $alphaDen")
    require(threshold >= 0, s"threshold must be >= 0: $threshold")
    val k = 1000000000000L
    val step = // shifted floor division: floor((x - s) / alphaDen)
      s"acc.s + (((p.x - acc.s) + $k * $alphaDen) div $alphaDen - $k)"
    val fold = s"""
      aggregate(__pts,
        struct(CAST(NULL AS BIGINT) AS s,
               CAST(array() AS array<struct<o: BIGINT, x: BIGINT,
                                            ew: BIGINT, flag: INT>>) AS out),
        (acc, p) -> struct(
          CASE WHEN acc.s IS NULL THEN p.x ELSE $step END AS s,
          concat(acc.out, array(struct(p.o AS o, p.x AS x,
            CASE WHEN acc.s IS NULL THEN p.x ELSE $step END AS ew,
            CASE WHEN acc.s IS NOT NULL AND abs(p.x - acc.s) > $threshold
                 THEN 1 ELSE 0 END AS flag))) AS out))"""
    df.select(col(keyCol).as("__k"), col(xCol).cast("long").as("__o"),
        col(valCol).cast("long").as("__x"))
      .where(col("__k").isNotNull && col("__o").isNotNull && col("__x").isNotNull)
      .groupBy("__k")
      .agg(sort_array(collect_list(struct(col("__o").as("o"), col("__x").as("x"))))
        .as("__pts"))
      .select(col("__k"), explode(expr(fold).getField("out")).as("__e"))
      .select(col("__k").as(keyCol), col("__e.o").as(xCol),
        col("__e.x").as(valCol), col("__e.ew").as("ewma"),
        col("__e.flag").as("flag"))
      .orderBy(keyCol, xCol)
  }

  /** Per-key ordinary-least-squares trend fit over (x, y) points —
    * "is this metric trending up?" as ONE aggregation, exact across
    * engines and cluster sizes because every step is integer:
    * {{{
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    * }}}
    * both emitted floor-quantized to 10⁻⁶ (ppm). x is REBASED to the
    * global minimum first (slope is translation-invariant — exactly
    * so in integer arithmetic — and the intercept becomes the fitted
    * value at the corpus' first x, a bounded, meaningful number).
    *
    * Floor on possibly-negative rationals is made engine-portable by
    * the positive-shift identity `floor(a/b) = (a + K·b) div b − K`
    * for `a + K·b ≥ 0` — truncating and flooring division agree on
    * positives. K = 10¹² (slope), 10¹⁸ (intercept).
    *
    * Magnitude contract, enforced LOUDLY driver-side on the actual
    * data (the [[sigmaOutliers]] pattern): with N = total points,
    * X = global rebased x span, Y = max|y|, the exact BigInt checks
    * {{{
    *   N·X²                     < 10³⁸   (Σx² aggregate)
    *   N·Y                      < 10³⁸   (Σy aggregate)
    *   N²·X²·(2·10⁶·Y + 10¹⁸)   < 10³⁸   (intercept numerator)
    * }}}
    * guarantee every DECIMAL(38) intermediate — Σxy, num_s, num_i,
    * den, and both shifted floor numerators — fits; past them this
    * throws instead of silently emitting NULL fits. (The third bound
    * dominates the slope side 2·10⁶·N²·X·Y + 10¹²·N²·X².) EAGER: the
    * bounds and the global x-min used for rebasing are one collected
    * stats row — a Spark job at DataFrame-construction time.
    *
    * 100 TB shape: one partial-aggregated shuffle on the key; the
    * global x-min enters as a literal, not a join. Keys where all x
    * coincide (den = 0) emit NULL slope/intercept.
    *
    * @return (key, n_points, slope_ppm, intercept_ppm)
    */
  def trendFit(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("__k"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .where(col("__k").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
    val b = base.agg(count(lit(1)).as("__n"), min(col("__x")).as("__x0"),
      max(col("__x")).as("__x1"), max(abs(col("__y"))).as("__ym")).first()
    val n = b.getLong(0)
    val x0v = if (n == 0) 0L else b.getLong(1)
    if (n > 0) {
      val span = BigInt(b.getLong(2)) - BigInt(x0v)
      val ymax = BigInt(b.getLong(3))
      val bigN = BigInt(n)
      val lim = BigInt(10).pow(38)
      require(bigN * span * span < lim,
        s"trendFit: n=$n with rebased x span=$span overflows DECIMAL(38) " +
          "in sum(x*x) — N*X^2 must stay below 10^38")
      require(bigN * ymax < lim,
        s"trendFit: n=$n with max|y|=$ymax overflows DECIMAL(38) in " +
          "sum(y) — N*Y must stay below 10^38")
      require(bigN * bigN * span * span *
          (BigInt(2000000) * ymax + BigInt(10).pow(18)) < lim,
        s"trendFit: n=$n, rebased x span=$span, max|y|=$ymax overflow " +
          "DECIMAL(38) in the intercept numerator — " +
          "N^2*X^2*(2e6*Y + 1e18) must stay below 10^38")
    }
    val dec = "decimal(38,0)"
    val stats = base
      .select(col("__k"), (col("__x") - lit(x0v)).as("__x"), col("__y"))
      .groupBy("__k")
      .agg(count(lit(1)).as("n_points"),
        sum(col("__x").cast(dec)).as("sx"),
        sum(col("__y").cast(dec)).as("sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("sxx"))
      .withColumn("num_s", col("n_points").cast(dec) * col("sxy") - col("sx") * col("sy"))
      .withColumn("num_i", col("sy") * col("sxx") - col("sx") * col("sxy"))
      .withColumn("den", col("n_points").cast(dec) * col("sxx") - col("sx") * col("sx"))
    stats.select(col("__k").as(keyCol), col("n_points"),
        when(col("den") === 0, lit(null).cast("long")).otherwise(expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * num_s + CAST(1000000000000 AS DECIMAL(38,0)) * den) div den - 1000000000000"))
          .as("slope_ppm"),
        when(col("den") === 0, lit(null).cast("long")).otherwise(expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * num_i + CAST(1000000000000000000 AS DECIMAL(38,0)) * den) div den - 1000000000000000000"))
          .as("intercept_ppm"))
      .orderBy(keyCol)
  }

  /** Sample autocorrelation of ONE integer series at lags 1..maxLag —
    * the seasonality probe (weekly revenue cycles light up lag 7)
    * and the "is this metric mean-reverting or trending" diagnostic.
    *
    * `r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²` computed on
    * the mean-free integers `y_t = n·x_t − S` (numerator and
    * denominator both scale by n², which cancels) — no float mean, no
    * rounding. The ppm render uses the trendFit offset trick
    * (`(10⁶·num + 10⁷·den) div den − 10⁷`) so the divided quantity is
    * positive and truncating vs flooring division can never differ
    * between engines; |r_k| ≤ 1 by Cauchy–Schwarz keeps the offset
    * sound. DECIMAL(38) bound enforced loudly: n²·x_max² ·n·10⁶ must
    * stay under 10³⁸ (n ≤ 10⁴ with cents ≤ 10¹⁰ passes with room).
    *
    * Scale shape: the series is an AGGREGATE (one day = one row), so
    * n is calendar-bounded — thousands, not corpus-sized. One count/
    * sum pass (driver scalars n, S), one t-keyed self-join fanned by
    * the lag list, one final aggregation. The input must carry a
    * dense 1-based index `t` (row_number over the series order). */
  def acf(series: DataFrame, tCol: String, valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val row = series.agg(count(lit(1)), sum(col(valCol).cast("long")),
      max(abs(col(valCol).cast("long")))).head()
    val n = row.getLong(0)
    require(n > maxLag, s"need more than $maxLag points, have $n")
    val s0 = row.getLong(1)
    val xmax = row.getLong(2)
    // num, den ≤ n³·x_max²; the render computes 10⁶·num + 10⁷·den,
    // so the largest intermediate is (10⁶+10⁷)·n³·x_max²
    require(BigInt(n).pow(3) * BigInt(xmax).pow(2) * 11000000L <
        BigInt(10).pow(38),
      s"acf: n=$n with |x| up to $xmax overflows DECIMAL(38)")
    val dec = "decimal(38,0)"
    val y = series.select(col(tCol).cast("long").as("t"),
      (lit(n) * col(valCol).cast("long") - lit(s0)).as("y"))
    val den = y.agg(sum(col("y").cast(dec) * col("y").cast(dec))).head()
      .getDecimal(0)
    require(den.signum() != 0,
      "acf: constant series (zero variance) has no defined autocorrelation")
    val lagged = y.select(col("t"), col("y"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .select((col("t") - col("lag")).as("t"), col("lag"),
        col("y").as("y_lead"))
    y.join(lagged, Seq("t"))
      .groupBy("lag")
      .agg(sum(col("y").cast(dec) * col("y_lead").cast(dec)).as("num"),
        count(lit(1)).as("n_pairs"))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        expr(s"""(CAST(1000000 AS $dec) * num + CAST(10000000 AS $dec)
                 | * CAST(${den.toPlainString} AS $dec))
                 | div CAST(${den.toPlainString} AS $dec)
                 | - 10000000""".stripMargin)
          .cast("long").as("acf_ppm"))
      .orderBy("lag")
  }

  /** Holt linear (double-exponential) smoothing chart: [[ewmaChart]]
    * plus a TREND state, so the one-step forecast follows a drifting
    * series instead of lagging it — the standard level+trend
    * forecaster for KPI monitoring.
    *
    * Integer recurrence with α = 1/alphaDen, β = 1/betaDen and the
    * EWMA shifted-floor-division trick for sign-safe floors:
    * `pred = l + b; l' = pred + ⌊(x − pred)/αDen⌋;
    * b' = b + ⌊((l' − l) − b)/βDen⌋`, seeded `l₁ = x₁, b₁ = 0`.
    * Exact integers end to end; the oracle replays it as a recursive
    * CTE carrying (level, trend).
    *
    * Same scale shape as [[ewmaChart]]: ONE key shuffle, the fold runs
    * array-side per key over the time-sorted points (series per key
    * are aggregate-bounded by contract).
    *
    * Output: `keyCol, xCol, valCol, forecast, level, trend, err`
    * (err = value − forecast; forecast at t=1 is the value itself). */
  def holtChart(df: DataFrame, keyCol: String, xCol: String, valCol: String,
                alphaDen: Int, betaDen: Int): DataFrame = {
    require(alphaDen >= 1 && betaDen >= 1,
      s"denominators must be >= 1: ($alphaDen, $betaDen)")
    val k = 1000000000000L
    // sign-safe floors via the +K shift (valid while |numerator| < K·den);
    // lambdas cannot hold subqueries, so the level expression is inlined
    // textually wherever the recurrence references it
    val ln = s"((acc.l + acc.b) + (((p.x - (acc.l + acc.b)) + $k * $alphaDen) div $alphaDen - $k))"
    val bn = s"(acc.b + (((($ln - acc.l) - acc.b) + $k * $betaDen) div $betaDen - $k))"
    val fold = s"""
      aggregate(__pts,
        struct(CAST(NULL AS BIGINT) AS l, CAST(NULL AS BIGINT) AS b,
               CAST(array() AS array<struct<o: BIGINT, x: BIGINT,
                 fc: BIGINT, l: BIGINT, b: BIGINT>>) AS out),
        (acc, p) -> CASE WHEN acc.l IS NULL THEN
            struct(p.x AS l, CAST(0 AS BIGINT) AS b,
              array(struct(p.o AS o, p.x AS x, p.x AS fc,
                p.x AS l, CAST(0 AS BIGINT) AS b)) AS out)
          ELSE
            struct($ln AS l, $bn AS b,
              concat(acc.out, array(struct(p.o AS o, p.x AS x,
                (acc.l + acc.b) AS fc, $ln AS l, $bn AS b))) AS out)
          END)"""
    df.select(col(keyCol).as("__k"), col(xCol).cast("long").as("__o"),
        col(valCol).cast("long").as("__x"))
      .where(col("__k").isNotNull && col("__o").isNotNull && col("__x").isNotNull)
      .groupBy("__k")
      .agg(sort_array(collect_list(struct(col("__o").as("o"), col("__x").as("x"))))
        .as("__pts"))
      .select(col("__k"), explode(expr(fold).getField("out")).as("__e"))
      .select(col("__k").as(keyCol), col("__e.o").as(xCol),
        col("__e.x").as(valCol), col("__e.fc").as("forecast"),
        col("__e.l").as("level"), col("__e.b").as("trend"),
        (col("__e.x") - col("__e.fc")).as("err"))
      .orderBy(keyCol, xCol)
  }

  /** Single best changepoint of a NONNEGATIVE integer series (counts,
    * cents — keeps every div operand positive, where Spark's
    * truncating `div` and DuckDB's flooring `//` agree) by exact
    * two-segment
    * least squares: the split t* minimizing SSE_left + SSE_right —
    * equivalently (Σx² is constant) MAXIMIZING the between-segment
    * term `f(t) = S_l²/t + S_r²/(n−t)`, which needs only prefix sums.
    * The level-shift detector for "did the metric move, and when".
    *
    * Every candidate's score is the exact rational
    * `num(t)/den(t) = (S_l²·(n−t) + S_r²·t) / (t·(n−t))`, rendered as
    * the integer `score_q = num div (den·scoreUnit)` (DECIMAL(38)
    * inside, LONG out — Spark's decimal `div` yields a long, so
    * f(t) ≤ Σx² ≤ n·x_max² must fit after the unit division; the
    * require bounds it below 10¹⁸·scoreUnit). Pick `scoreUnit` at the
    * value scale: 1 for small integers, 10⁶ for cents-sized sums. The
    * argmax is over (score_q desc, t asc) — a total order on
    * integers, so both engines pick the identical breakpoint even
    * among near-ties (sub-unit ties collapse onto the same floor in
    * BOTH engines and resolve by t).
    *
    * Scale shape: one window prefix-sum over the t-ordered series and
    * one TakeOrdered(1) — the series is an aggregate (one row per
    * day/hour), calendar-bounded like [[acf]], so the unpartitioned
    * window is a deliberate control-plane-sized sort, not a corpus
    * shuffle.
    *
    * Output: one row `(t_break, n, score_q, mean_left_ppm,
    * mean_right_ppm)`; means are `floor(10⁶·S/t)` ppm. */
  /** Smallest `minUnit·10^k` keeping [[changepoint]]'s long quotient
    * bound `n·x_max² < 10¹⁸·unit` satisfied for THIS series — the
    * scale-proof way to pick `scoreUnit`: a fixed unit that fits
    * sf0.1 revenue overflows at 10× the data (measured: sf1 daily
    * cents reach 2.3·10¹⁰ over 2405 days). One driver-side agg over
    * the calendar-bounded series; callers render the CHOSEN unit into
    * their oracle (the fitted-model literal pattern). */
  def changepointAutoUnit(series: DataFrame, valCol: String,
                          minUnit: Long = 1L): Long = {
    require(minUnit >= 1)
    val row = series.agg(count(lit(1)),
      max(abs(col(valCol).cast("long")))).head()
    val n = row.getLong(0)
    val xmax = math.max(row.getLong(1), 1L)
    var unit = minUnit
    while (BigInt(n) * BigInt(xmax).pow(2) >= BigInt(10).pow(18) * unit)
      unit *= 10
    unit
  }

  def changepoint(series: DataFrame, tCol: String, valCol: String,
                  scoreUnit: Long = 1L): DataFrame = {
    require(scoreUnit >= 1, s"scoreUnit must be >= 1: $scoreUnit")
    val row = series.agg(count(lit(1)), sum(col(valCol).cast("long")),
      max(abs(col(valCol).cast("long")))).head()
    val n = row.getLong(0)
    require(n >= 2, s"need >= 2 points to split, have $n")
    val s0 = row.getLong(1)
    val xmax = math.max(row.getLong(2), 1L)
    require(BigInt(n).pow(3) * BigInt(xmax).pow(2) < BigInt(10).pow(38),
      s"changepoint: n=$n with |x| up to $xmax overflows DECIMAL(38)")
    // the LONG quotient bound: score_q = f(t)/unit <= n·x_max²/unit
    // must fit the long that Spark's decimal `div` returns
    require(BigInt(n) * BigInt(xmax).pow(2) < BigInt(10).pow(18) * scoreUnit,
      s"changepoint: n=$n with |x| up to $xmax overflows the score long " +
        s"at scoreUnit=$scoreUnit — raise the unit")
    val dec = "decimal(38,0)"
    val w = Window.orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.select(col(tCol).cast("long").as("t"),
        col(valCol).cast("long").as("x"))
      .withColumn("sl", sum("x").over(w))
      .filter(col("t") < n)
      .withColumn("sr", lit(s0) - col("sl"))
      .withColumn("score_q", expr(
        s"""(CAST(sl AS $dec) * CAST(sl AS $dec) * CAST(${n}L - t AS $dec)
           | + CAST(sr AS $dec) * CAST(sr AS $dec) * CAST(t AS $dec))
           | div (CAST(t AS $dec) * CAST(${n}L - t AS $dec)
           |      * CAST(${scoreUnit}L AS $dec))""".stripMargin))
      .orderBy(col("score_q").desc, col("t").asc)
      .limit(1)
      .select(col("t").as("t_break"), lit(n).as("n"), col("score_q"),
        // ppm means in DECIMAL: 10^6 · Σx overflows the LONG once the
        // series total passes ~9·10^12 (seen at sf1 revenue scale);
        // the div quotient (10^6 · mean) still fits a long under the
        // |x| < 10^15 family contract
        expr(s"(CAST(1000000 AS $dec) * CAST(sl AS $dec)) div CAST(t AS $dec)")
          .as("mean_left_ppm"),
        expr(s"(CAST(1000000 AS $dec) * CAST(sr AS $dec)) div CAST(${n}L - t AS $dec)")
          .as("mean_right_ppm"))
  }

  /** DuckDB replica of [[changepoint]] (HUGEINT). `seriesSql` must
    * yield (t, x) with t dense 1-based. */
  def changepointOracleSql(seriesSql: String, scoreUnit: Long = 1L): String =
    s"""WITH s AS (SELECT CAST(t AS HUGEINT) AS t, CAST(x AS HUGEINT) AS x
       |           FROM ($seriesSql)),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s0 FROM s),
       |pre AS (SELECT t, sum(x) OVER (ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl
       |        FROM s),
       |cand AS (SELECT t, sl, s0 - sl AS sr,
       |    (sl * sl * (n - t) + (s0 - sl) * (s0 - sl) * t)
       |      // (t * (n - t) * $scoreUnit) AS score_q, n
       |  FROM pre, nn WHERE t < n)
       |SELECT CAST(t AS BIGINT) AS t_break, CAST(n AS BIGINT) AS n,
       |  CAST(score_q AS BIGINT) AS score_q,
       |  CAST((1000000 * sl) // t AS BIGINT) AS mean_left_ppm,
       |  CAST((1000000 * sr) // (n - t) AS BIGINT) AS mean_right_ppm
       |FROM cand ORDER BY score_q DESC, t ASC LIMIT 1""".stripMargin

  /** DuckDB replica of [[acf]]: identical mean-free integers and the
    * identical positive-offset division. `seriesSql` must yield
    * (t, x) with t a dense 1-based BIGINT index. */
  def acfOracleSql(seriesSql: String, maxLag: Int): String =
    s"""WITH s AS (SELECT CAST(t AS HUGEINT) AS t, CAST(x AS HUGEINT) AS x
       |           FROM ($seriesSql)),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s0 FROM s),
       |y AS (SELECT t, n * x - s0 AS y FROM s, nn),
       |den AS (SELECT sum(y * y) AS d FROM y),
       |lags AS (SELECT unnest(range(1, ${maxLag + 1})) AS lag),
       |pairs AS (SELECT a.y AS ya, b.y AS yb, l.lag
       |          FROM y a JOIN lags l ON true
       |          JOIN y b ON b.t = a.t + l.lag)
       |SELECT CAST(lag AS BIGINT) AS lag,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST((1000000 * sum(ya * yb) + 10000000 * (SELECT d FROM den))
       |       // (SELECT d FROM den) - 10000000 AS BIGINT) AS acf_ppm
       |FROM pairs GROUP BY lag ORDER BY lag""".stripMargin

  /** Gap-filled resample with LINEAR interpolation — the missing-day
    * estimator [[resampleFfill]]'s step-function fill understates:
    * each absent grid point t between observations (pd, pv) and
    * (nd, nv) gets `pv + (nv − pv)·(t − pd) / (nd − pd)` floored —
    * sign-safely: the numerator can be negative on falling series, so
    * the floor uses the data-dependent +K shift with K = |nv − pv| + 1
    * (bounding |num| < K·gap since t − pd < gap), keeping the dividend
    * nonnegative where Spark's truncating `div` and DuckDB's flooring
    * `//` agree. Observed points pass through untouched; output covers
    * exactly [min t, max t] of each key (interpolation only — no edge
    * extrapolation, which would be invention, not estimation).
    *
    * Input contract: `df` is an aggregated series — ONE row per
    * (key, t); t is a long grid index (day number, hour number).
    *
    * Scale shape: one per-key bounds aggregate whose `sequence()` span
    * explodes into the grid (calendar-bounded by contract), one key
    * shuffle for the union-marker window ([[resampleFfill]]'s layout):
    * `last(ignoreNulls)` carries (pd, pv) forward, `first(ignoreNulls)`
    * over the FOLLOWING frame carries (nd, nv) backward — no per-gap
    * join anywhere.
    *
    * @return (keyCols…, t, value, is_obs) — `value` the observed or
    *         interpolated long, one row per key per grid t
    */
  def resampleLinear(df: DataFrame, keyCols: Seq[String], tCol: String,
                     valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val obs = df.select(keys ++ Seq(col(tCol).cast("long").as("t"),
      col(valCol).cast("long").as("__v"), lit(0).as("__g")): _*)
    val grid = df.groupBy(keys: _*)
      .agg(min(col(tCol).cast("long")).as("__lo"),
        max(col(tCol).cast("long")).as("__hi"))
      .select(keys ++ Seq(explode(expr("sequence(__lo, __hi)")).as("t"),
        lit(null).cast("long").as("__v"), lit(1).as("__g")): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("t"), col("__g"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)
    obs.unionByName(grid)
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(when(col("__g") === 0, col("t")),
        ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(when(col("__g") === 0, col("t")),
        ignoreNulls = true).over(wNext))
      .filter(col("__g") === 1)
      .withColumn("value", when(col("__pd") === col("t"), col("__pv"))
        .otherwise(expr("""__pv + ((__nv - __pv) * (t - __pd)
                          |  + (abs(__nv - __pv) + 1) * (__nd - __pd))
                          |  div (__nd - __pd) - (abs(__nv - __pv) + 1)""".stripMargin)))
      .withColumn("is_obs", (col("__pd") === col("t")).cast("int"))
      .select(keys ++ Seq(col("t"), col("value"), col("is_obs")): _*)
  }

  /** DuckDB rendering of [[resampleLinear]] over `relSql` projecting
    * (keyCols..., t, v) — segment walk: each observation pairs with
    * its successor via `lead`, generate_series fills [t, next − 1],
    * the final observation emits itself. */
  def resampleLinearOracleSql(relSql: String, keyCols: Seq[String]): String = {
    val ks = keyCols.mkString(", ")
    s"""WITH rel AS ($relSql),
       |seg AS (SELECT $ks, t, v,
       |          lead(t) OVER (PARTITION BY $ks ORDER BY t) AS nt,
       |          lead(v) OVER (PARTITION BY $ks ORDER BY t) AS nv
       |        FROM rel),
       |pts AS (SELECT $ks, t AS pd, v AS pv, nt, nv,
       |          unnest(generate_series(t,
       |            CASE WHEN nt IS NULL THEN t ELSE nt - 1 END)) AS t
       |        FROM seg)
       |SELECT $ks, t,
       |  CASE WHEN t = pd THEN pv
       |       ELSE pv + ((nv - pv) * (t - pd)
       |              + (abs(nv - pv) + 1) * (nt - pd)) // (nt - pd)
       |            - (abs(nv - pv) + 1) END AS value,
       |  CASE WHEN t = pd THEN 1 ELSE 0 END AS is_obs
       |FROM pts ORDER BY $ks, t""".stripMargin
  }

  /** Classical additive seasonal decomposition (the moving-average
    * core of STL without loess): v = trend + seasonal + residual.
    * Trend is the centered `period`-point moving average (odd period
    * required — no half-weights), FLOOR-quantized so it is one
    * well-defined integer per day; seasonal is the floor-mean of the
    * detrended values per phase (t mod period); residual closes the
    * identity exactly. Interior points only (the first/last
    * ⌊period/2⌋ rows have no centered window) — NULL trend/seasonal/
    * residual there, like every stats package.
    *
    * Determinism: all arithmetic is the engine-portable floor
    * identity (values may be negative); the input must be a
    * CONTIGUOUS series (one row per consecutive t — join a date
    * spine + zero-fill upstream; enforced loudly, because a silent
    * gap would shift every phase after it).
    *
    * Scale shape: the trend is an explode of each row to its
    * `period` covering windows + one sum-agg on the window key —
    * partial-agg friendly, NO row-ordered window over the series;
    * phase means are a `period`-row broadcast join back. The series
    * is a metric grain (days/hours), not a corpus.
    *
    * @return (t, v, trend, seasonal, resid) — one row per input row
    */
  def seasonalDecompose(series: DataFrame, tCol: String, vCol: String,
                        period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (centered window), got $period")
    val half = period / 2
    val pts = Materialize.once(series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v")))
    val st = pts.agg(count(lit(1)), countDistinct(col("t")),
      min(col("t")), max(col("t"))).head()
    val n = st.getLong(0)
    require(n >= period, s"seasonalDecompose: need >= $period points, got $n")
    require(st.getLong(1) == n && st.getLong(3) - st.getLong(2) + 1 == n,
      "seasonalDecompose: series must be contiguous with distinct t " +
        "(join a date spine and zero-fill upstream); a silent gap would " +
        "shift every phase after it")
    val lo = st.getLong(2)
    val hi = st.getLong(3)
    def fdiv(a: String, b: String) =
      s"($a - ((($a) % ($b)) + ($b)) % ($b)) div ($b)"
    // each point contributes to the `period` centered windows that
    // cover it; window key = center day
    val trend = pts
      .select(explode(sequence(col("t") - half, col("t") + half))
        .as("ct"), col("v"))
      .filter(col("ct") >= lo + half && col("ct") <= hi - half)
      .groupBy(col("ct")).agg(sum(col("v")).as("__ts"))
      .select(col("ct").as("t"),
        expr(fdiv("__ts", period.toString)).as("trend"))
    val detr = pts.join(trend, Seq("t"), "left")
      .withColumn("__phase", pmod(col("t"), lit(period.toLong)))
    val seasonal = detr.filter(col("trend").isNotNull)
      .groupBy(col("__phase"))
      .agg(sum(col("v") - col("trend")).as("__ds"),
        count(lit(1)).as("__dn"))
      .select(col("__phase"),
        expr(fdiv("__ds", "__dn")).as("seasonal"))
    detr.join(broadcast(seasonal), Seq("__phase"), "left")
      .select(col("t"), col("v"), col("trend"),
        when(col("trend").isNull, lit(null).cast("long"))
          .otherwise(col("seasonal")).as("seasonal"),
        when(col("trend").isNull, lit(null).cast("long"))
          .otherwise(col("v") - col("trend") - col("seasonal")).as("resid"))
  }

  /** DuckDB replay of [[seasonalDecompose]] — the oracle USES ordered
    * windows (fine engine-side; determinism only needs the integer
    * identities to match). `seriesSql` yields a contiguous (t, v). */
  def seasonalDecomposeOracleSql(seriesSql: String, period: Int): String = {
    val half = period / 2
    def fd(a: String, b: String) =
      s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) // ($b)"
    s"""WITH s AS (SELECT CAST(t AS BIGINT) AS t, CAST(v AS BIGINT) AS v
       |  FROM ($seriesSql) WHERE t IS NOT NULL AND v IS NOT NULL),
       |tr AS (SELECT t, v,
       |    CASE WHEN count(*) OVER w = $period
       |      THEN CAST(${fd("sum(v) OVER w", period.toString)} AS BIGINT)
       |    END AS trend
       |  FROM s WINDOW w AS (ORDER BY t
       |    ROWS BETWEEN $half PRECEDING AND $half FOLLOWING)),
       |ph AS (SELECT ((t % $period) + $period) % $period AS phase,
       |    CAST(${fd("sum(v - trend)", "count(*)")} AS BIGINT) AS seasonal
       |  FROM tr WHERE trend IS NOT NULL GROUP BY 1)
       |SELECT t, v, trend,
       |  CASE WHEN trend IS NULL THEN NULL ELSE seasonal END AS seasonal,
       |  CASE WHEN trend IS NULL THEN NULL
       |    ELSE v - trend - seasonal END AS resid
       |FROM tr LEFT JOIN ph
       |  ON ((t % $period) + $period) % $period = phase
       |ORDER BY t""".stripMargin
  }

  /** One-sided CUSUM drift chart (Page 1954, Biometrika 41): the
    * classic sequential change detector over a metric series —
    * `s_t = max(0, s_{t−1} + (x_t − ref − slack))`, alarm when `s_t`
    * crosses `threshold`. The recursion is computed CLOSED-FORM via
    * the reflection identity `s_t = p_t − min(0, min_{j≤t} p_j)` with
    * `p` the prefix sum of `(x − ref − slack)` — two cumulative
    * windows instead of a sequential fold, so both engines replay it
    * exactly ([[cusumOracleSql]]) and nothing is iterative.
    *
    * `ref`/`slack`/`threshold` are caller-supplied integer literals
    * (derive them from the same data with exact integer arithmetic —
    * e.g. `ref = Σx div n` — so a static oracle reproduces them).
    * Exact integers throughout; overflow is guarded up front:
    * n·(x_max + |ref| + slack) must fit a Long.
    *
    * Scale shape: the single ordered window is a deliberate
    * control-plane-sized sort over the (pre-aggregated) series — the
    * [[changepoint]] discipline: daily/hourly metric charts, never a
    * raw corpus.
    *
    * @param series one row per point: (tCol orderable, valCol long)
    * @return (t, x, cusum, alarm) in t order */
  def cusum(series: DataFrame, tCol: String, valCol: String,
            ref: Long, slack: Long, threshold: Long): DataFrame = {
    require(slack >= 0, s"slack must be >= 0: $slack")
    val pts = Materialize.once(series
      .filter(col(tCol).isNotNull && col(valCol).isNotNull)
      .select(col(tCol).as("t"), col(valCol).cast("long").as("x")))
    val st = pts.agg(count(lit(1)), countDistinct(col("t")),
      max(abs(col("x")))).head()
    val n = st.getLong(0)
    require(n >= 1, "cusum: empty series")
    require(st.getLong(1) == n,
      "cusum: duplicate t values — pre-aggregate to one row per point")
    val xmax = st.getLong(2)
    require(BigInt(n) * (BigInt(xmax) + BigInt(ref).abs + BigInt(slack)) <
        BigInt(Long.MaxValue),
      s"cusum: n=$n with |x| up to $xmax and ref=$ref slack=$slack " +
        "overflows the prefix-sum Long; re-unit the value column")
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("__p", sum(col("x") - lit(ref) - lit(slack)).over(w))
      .withColumn("__pmin", min(col("__p")).over(w))
      .select(col("t"), col("x"),
        (col("__p") - least(col("__pmin"), lit(0L))).as("cusum"))
      .withColumn("alarm", col("cusum") > lit(threshold))
  }

  /** DuckDB replica of [[cusum]]: identical prefix/reflection
    * arithmetic. `seriesSql` yields (t, x) with distinct t. */
  def cusumOracleSql(seriesSql: String, refSql: String, slackSql: String,
                     thresholdSql: String): String =
    s"""WITH src AS (SELECT t, CAST(x AS BIGINT) AS x FROM ($seriesSql)
       |  WHERE t IS NOT NULL AND x IS NOT NULL),
       |k AS (SELECT CAST(($refSql) AS BIGINT) AS ref,
       |  CAST(($slackSql) AS BIGINT) AS slack,
       |  CAST(($thresholdSql) AS BIGINT) AS thr),
       |pre AS (SELECT t, x,
       |    sum(x - (SELECT ref FROM k) - (SELECT slack FROM k))
       |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS p FROM src),
       |mn AS (SELECT t, x, p,
       |    min(p) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS pmin
       |  FROM pre)
       |SELECT t, x, CAST(p - least(pmin, 0) AS BIGINT) AS cusum,
       |  (p - least(pmin, 0)) > (SELECT thr FROM k) AS alarm
       |FROM mn ORDER BY t""".stripMargin
}
