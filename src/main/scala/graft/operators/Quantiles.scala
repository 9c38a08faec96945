package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact (not approximate) grouped percentiles by rank selection —
  * the summary-statistics operator for skew diagnosis, SLA reporting
  * and sampling-threshold calibration, where `percentile_approx`'s
  * error bound is not acceptable.
  *
  * Semantics: discrete (type-1) quantile — the value at 1-indexed rank
  * `max(1, ceil(n·p/100))` of the group's ascending sort. The target
  * rank is computed in INTEGER arithmetic (`(n·p + 99) div 100`), not
  * via `ceil(double·double)`: `0.95·n` is not exact in binary and its
  * ceil can land one rank off the mathematical answer at exact
  * multiples. The selected VALUE is emitted untouched (no arithmetic),
  * so the result is engine-portable for any orderable column type.
  *
  * 100 TB shape: one hash shuffle on the group key, then a
  * partition-local sort (WindowExec spills to disk past memory, so a
  * single giant group degrades but does not OOM). The percent list
  * rides as an exploded literal array — no extra shuffle, no join.
  * For a handful of global quantiles over a single colossal group,
  * prefer a two-phase histogram-refine selection (bucket counts →
  * re-scan the one target bucket); this operator is the exact grouped
  * path where groups are plentiful and the sort parallelizes.
  */
object Quantiles {

  /** Exact per-group percentile values. NULL values are excluded
    * before ranking (`n` counts non-null rows) — Spark's ascending
    * window puts NULLs FIRST while most SQL engines' `row_number`
    * defaults to NULLS LAST, so ranking over a nullable column would
    * silently select different values per engine.
    *
    * @param pcts integer percents in (0, 100], e.g. Seq(25, 50, 75, 95, 99)
    * @return keyCols ++ (pct, pct_value, n) — one row per (group, pct)
    */
  def exactPercentiles(df: DataFrame, keyCols: Seq[String], valCol: String,
                       pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      s"percents must be in (0, 100]: $pcts")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(valCol))
    val wAll = Window.partitionBy(keys: _*)
    val ranked = df.select(keys :+ col(valCol): _*)
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    ranked
      .select(keys ++ Seq(col(valCol), col("__rn"), col("__n"),
        explode(array(pcts.map(lit): _*)).as("pct")): _*)
      // integer ceil-division: rank = max(1, ceil(n*pct/100)) exactly
      .filter(col("__rn") === greatest(lit(1L), expr("(__n * pct + 99) div 100")))
      .select(keys ++ Seq(col("pct"), col(valCol).as("pct_value"),
        col("__n").as("n")): _*)
  }

  /** Exact GLOBAL percentiles of one colossal value set by iterative
    * histogram refinement — the selection algorithm for the case
    * [[exactPercentiles]]'s per-group sort can't shard: no global
    * sort, no single-partition window. Each round is one scan that
    * bucket-counts the surviving range (map-side combined to ≤
    * `buckets` rows), the driver walks the cumulative histogram to
    * the target bucket, and the filter narrows — candidates shrink
    * ~buckets× per round, so a 10¹²-row column needs ~4 scans before
    * the [[directThreshold]]-sized remainder is picked exactly by a
    * bounded TakeOrdered. Returns the value AT the rank (type-1, rank
    * = max(1, ceil(n·p/100)) in integer math), identical to the
    * sort-based answer: bucket boundaries only steer the search, they
    * never touch the rank arithmetic, and membership filters reuse
    * the exact bucket expression, so double rounding at a boundary
    * cannot lose or double-count a row.
    *
    * EAGER: runs its scans at call time; the result is a small local
    * DataFrame of (pct, pct_value, n).
    */
  def exactGlobalPercentiles(df: DataFrame, valCol: String, pcts: Seq[Int],
                             buckets: Int = 1024,
                             directThreshold: Long = 1000000L): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100))
    require(buckets >= 2 && directThreshold >= 1)
    val spark = df.sparkSession
    val vals = df.select(col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .transform(Materialize.once) // every refinement round re-reads it
    val n = vals.count()
    require(n > 0, "no non-null values")

    // bounded remainder: (target−offset)-th smallest via TakeOrdered+max
    def directPick(cur: DataFrame, target: Long, offset: Long): Double =
      cur.orderBy(col("v")).limit((target - offset).toInt)
        .agg(max(col("v"))).head().getDouble(0)

    // refinement from a given surviving range; the EXACT bucket
    // expression is reused for counting and filtering, so boundary
    // rounding can never lose or double-count a row
    def refine(cur0: DataFrame, remaining0: Long, offset0: Long,
               target: Long): Double = {
      var cur = cur0; var remaining = remaining0; var offset = offset0
      while (true) {
        if (remaining <= directThreshold) return directPick(cur, target, offset)
        val Array(lo, hi) = cur.agg(min(col("v")), max(col("v")))
          .head().toSeq.map(_.asInstanceOf[Double]).toArray
        if (lo == hi) return lo
        // adjacent-double range: width underflows to 0 and every row
        // would land in one bucket forever — pick directly instead
        val width = (hi - lo) / buckets
        if (width == 0.0 || !java.lang.Double.isFinite(width))
          return directPick(cur, target, offset)
        val bucketExpr = least(lit(buckets - 1),
          floor((col("v") - lit(lo)) / lit(width)).cast("int"))
        val hist = cur.groupBy(bucketExpr.as("b")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        var cum = offset; var b = 0
        while (b < buckets && cum + hist.getOrElse(b, 0L) < target) {
          cum += hist.getOrElse(b, 0L); b += 1
        }
        cur = cur.filter(bucketExpr === b).transform(Materialize.once)
        offset = cum
        remaining = hist.getOrElse(b, 0L)
      }
      0.0 // unreachable
    }

    // the ONLY corpus-sized scans happen once, SHARED by all targets:
    // one (min, max) pass and one top-level histogram. Each target then
    // refines inside its own bucket (per-bucket frames memoized so
    // targets landing in the same bucket reuse one checkpoint).
    val targets = pcts.map(p => p -> math.max(1L, (n * p + 99) / 100))
    val values: Map[Long, Double] =
      if (n <= directThreshold)
        targets.map(_._2).distinct.map(t => t -> directPick(vals, t, 0L)).toMap
      else {
        val Array(lo, hi) = vals.agg(min(col("v")), max(col("v")))
          .head().toSeq.map(_.asInstanceOf[Double]).toArray
        if (lo == hi) targets.map(_._2).distinct.map(t => t -> lo).toMap
        else if ((hi - lo) / buckets == 0.0 ||
          !java.lang.Double.isFinite((hi - lo) / buckets))
          targets.map(_._2).distinct.map(t => t -> directPick(vals, t, 0L)).toMap
        else {
          val bucketExpr = least(lit(buckets - 1),
            floor((col("v") - lit(lo)) / lit((hi - lo) / buckets)).cast("int"))
          val hist = vals.groupBy(bucketExpr.as("b")).agg(count(lit(1)).as("c"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          val cumBefore = (0 until buckets)
            .scanLeft(0L)((acc, b) => acc + hist.getOrElse(b, 0L))
          val bucketFrames = scala.collection.mutable.Map.empty[Int, DataFrame]
          targets.map(_._2).distinct.map { t =>
            var b = 0
            while (b < buckets && cumBefore(b + 1) < t) b += 1
            val frame = bucketFrames.getOrElseUpdate(b,
              Materialize.once(vals.filter(bucketExpr === b)))
            t -> refine(frame, hist.getOrElse(b, 0L), cumBefore(b), t)
          }.toMap
        }
      }

    import spark.implicits._
    targets.map { case (p, t) => (p, values(t), n) }
      .toDF("pct", "pct_value", "n")
  }

  /** Robust per-group outlier report via the median / MAD modified
    * z-score (Iglewicz–Hoaglin): a point is flagged when
    * `0.6745·|x−med| / MAD > 3.5`, evaluated as the integer
    * cross-multiplication `6745·|x−med| > 35000·MAD` — no division,
    * no floats, engine-exact. This is the outlier rule that survives
    * the outliers themselves (mean/σ rules drag their own threshold
    * toward the anomaly; median and MAD have 50% breakdown).
    *
    * Contract: `valCol` is ALREADY integer-quantized (cents, µs —
    * the sigmaOutliers convention). Median and MAD are type-1 low
    * medians (value at 1-indexed rank `(n+1) div 2` of the ascending
    * sort, ties then broken arbitrarily but harmlessly: equal values
    * select equal answers). `MAD = 0` (over half the group identical)
    * flags every deviating point — the rule's standard degenerate
    * behavior, noted here because it is deliberate.
    *
    * Scale shape: two window sorts on the SAME group-key partitioning
    * (median of values, then median of deviations — the second sort
    * reuses the first's exchange) plus one group-sized broadcast-able
    * join back; WindowExec spills past memory, so giant groups
    * degrade, not OOM.
    *
    * Output: `keyCols ++ (n, median, mad, n_outliers, max_abs_dev)`.
    */
  def madOutliers(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    def lowMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(keys: _*).orderBy(col(c))
      val wAll = Window.partitionBy(keys: _*)
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(wAll))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(keys ++ Seq(col(c).as(out), col("__n").as(s"${out}_n")): _*)
    }
    val vals = df.select(keys :+ col(valCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val med = lowMedian(vals, "__v", "median")
    val dev = vals.join(med, keyCols)
      .withColumn("__dev", abs(col("__v") - col("median")))
    val mad = lowMedian(dev.select(keys :+ col("__dev"): _*), "__dev", "mad")
    dev.join(mad, keyCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        min("median").as("median"),
        min("mad").as("mad"),
        sum(when(col("__dev") * 6745L > col("mad") * 35000L, 1L).otherwise(0L))
          .as("n_outliers"),
        max("__dev").as("max_abs_dev"))
      .orderBy(keyCols.head, keyCols.tail: _*)
  }

  /** DuckDB replica of [[madOutliers]] — identical rank selection and
    * integer cross-multiplied threshold. `relSql` must yield the
    * group columns plus an integer `v`. */
  def madOutliersOracleSql(relSql: String, keyCols: Seq[String]): String = {
    val ks = keyCols.mkString(", ")
    s"""WITH vals AS (SELECT * FROM ($relSql) WHERE v IS NOT NULL),
       |rv AS (SELECT *, row_number() OVER (PARTITION BY $ks ORDER BY v) AS rn,
       |         count(*) OVER (PARTITION BY $ks) AS n FROM vals),
       |med AS (SELECT $ks, v AS median FROM rv WHERE rn = (n + 1) // 2),
       |dev AS (SELECT vals.*, med.median, abs(v - median) AS d
       |        FROM vals JOIN med USING ($ks)),
       |rd AS (SELECT *, row_number() OVER (PARTITION BY $ks ORDER BY d) AS rn,
       |         count(*) OVER (PARTITION BY $ks) AS n FROM dev),
       |mad AS (SELECT $ks, d AS mad FROM rd WHERE rn = (n + 1) // 2)
       |SELECT $ks, CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(median) AS BIGINT) AS median,
       |  CAST(min(mad) AS BIGINT) AS mad,
       |  CAST(sum(CASE WHEN d * 6745 > mad * 35000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers,
       |  CAST(max(d) AS BIGINT) AS max_abs_dev
       |FROM dev JOIN mad USING ($ks)
       |GROUP BY $ks ORDER BY $ks""".stripMargin
  }

  /** Winsorized mean per group: clamp values to the exact [loPct,
    * hiPct] type-1 percentile cuts, then take the mean — the standard
    * "mean that ignores fat tails without dropping rows" estimator
    * (trimming deletes, winsorizing clamps, so n stays n). Cuts use
    * the same integer rank arithmetic as [[exactPercentiles]]; means
    * are exact `floor(10⁶·Σ/n)` ppm on integer-quantized values (the
    * sigmaOutliers convention), so results hash-match the oracle.
    *
    * Scale shape: one group-key window sort for the ranks; cuts come
    * from the SAME ranked frame (no second scan), rejoin on the group
    * key, then one aggregation. Output: `keyCols ++ (n, lo_cut,
    * hi_cut, mean_ppm, winsorized_mean_ppm)`. */
  def winsorizedMean(df: DataFrame, keyCols: Seq[String], valCol: String,
                     loPct: Int, hiPct: Int): DataFrame = {
    require(loPct > 0 && hiPct <= 100 && loPct < hiPct,
      s"need 0 < loPct < hiPct <= 100: ($loPct, $hiPct)")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keys: _*)
    val ranked = df.select(keys :+ col(valCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val cuts = ranked
      .withColumn("__is_lo",
        col("__rn") === greatest(lit(1L), expr(s"(__n * $loPct + 99) div 100")))
      .withColumn("__is_hi",
        col("__rn") === greatest(lit(1L), expr(s"(__n * $hiPct + 99) div 100")))
      .filter(col("__is_lo") || col("__is_hi"))
      .groupBy(keys: _*)
      .agg(min(when(col("__is_lo"), col("__v"))).as("lo_cut"),
        min(when(col("__is_hi"), col("__v"))).as("hi_cut"))
    ranked.join(cuts, keyCols)
      .withColumn("__w", least(greatest(col("__v"), col("lo_cut")), col("hi_cut")))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        min("lo_cut").as("lo_cut"), min("hi_cut").as("hi_cut"),
        expr("(1000000 * sum(__v)) div count(1)").as("mean_ppm"),
        expr("(1000000 * sum(__w)) div count(1)").as("winsorized_mean_ppm"))
      .orderBy(keyCols.head, keyCols.tail: _*)
  }

  /** DuckDB replica of [[winsorizedMean]]. `relSql` must yield the
    * group columns plus integer `v`. */
  def winsorizedMeanOracleSql(relSql: String, keyCols: Seq[String],
                              loPct: Int, hiPct: Int): String = {
    val ks = keyCols.mkString(", ")
    s"""WITH vals AS (SELECT * FROM ($relSql) WHERE v IS NOT NULL),
       |ranked AS (SELECT *,
       |    row_number() OVER (PARTITION BY $ks ORDER BY v) AS rn,
       |    count(*) OVER (PARTITION BY $ks) AS n
       |  FROM vals),
       |cuts AS (SELECT $ks,
       |    min(CASE WHEN rn = greatest(1, (n * $loPct + 99) // 100)
       |        THEN v END) AS lo_cut,
       |    min(CASE WHEN rn = greatest(1, (n * $hiPct + 99) // 100)
       |        THEN v END) AS hi_cut
       |  FROM ranked GROUP BY $ks)
       |SELECT $ks, CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(lo_cut) AS BIGINT) AS lo_cut,
       |  CAST(min(hi_cut) AS BIGINT) AS hi_cut,
       |  CAST((1000000 * sum(v)) // count(*) AS BIGINT) AS mean_ppm,
       |  CAST((1000000 * sum(least(greatest(v, lo_cut), hi_cut))) // count(*)
       |    AS BIGINT) AS winsorized_mean_ppm
       |FROM ranked JOIN cuts USING ($ks)
       |GROUP BY $ks ORDER BY $ks""".stripMargin
  }

  /** Quantile discretization: a `bin` column counting the cut points
    * STRICTLY below the value (values equal to a cut fall in the
    * lower bin — an exact comparison on stored doubles, no
    * arithmetic, so engines agree bit-for-bit). Cuts are literals
    * (control-plane, e.g. from [[exactGlobalPercentiles]]), so the
    * assignment is a shuffle-free codegen projection — the
    * QuantileDiscretizer pattern without an ML pipeline. */
  def binByCuts(df: DataFrame, valCol: String, cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "need at least one cut point")
    df.withColumn("bin",
      cuts.map(c => when(col(valCol) > lit(c), 1L).otherwise(0L))
        .reduce(_ + _))
  }

  /** Exact `ntile(k) OVER (ORDER BY valCol, tieCol)` WITHOUT the
    * data-sized single-partition sort a global window needs — the
    * equal-count bucketing (deciles for curriculum/difficulty tiers)
    * at corpus scale.
    *
    * Decomposition: the global 1-based rank of a row is
    * `(# rows with a strictly smaller value) + (rank by tieCol inside
    * its value group)`. The first term comes from a VALUE-HISTOGRAM —
    * per-value counts with a running sum over the distinct-value
    * series (histogram-sized, not row-sized) broadcast back onto the
    * rows; the second from a window PARTITIONED by value (parallel
    * across value groups; one value group is at worst histogram-skew,
    * which spills rather than serializes the whole corpus). The tile
    * is then pure integer arithmetic replicating SQL `ntile`: with
    * `N = q·k + rem`, the first `rem` tiles hold `q+1` rows —
    * bit-identical to the window function in any engine.
    *
    * @param tieCol unique tiebreak column; (valCol, tieCol) must be a
    *               total order or ranks are ambiguous across engines
    * @return input columns + `tile` (1..k)
    */
  def ntileExact(df: DataFrame, valCol: String, tieCol: String, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val hist = df.groupBy(col(valCol)).agg(count(lit(1)).as("__c"))
    // running count of rows BELOW each value: a global window, but over
    // the distinct-value histogram (control-plane-sized), not the rows
    val below = hist.withColumn("__below",
        coalesce(sum(col("__c")).over(
          Window.orderBy(col(valCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__c")
    val total = df.agg(count(lit(1)).as("__n"))
    // null-safe (<=>) histogram join: NULL values rank like the window
    // function ranks them (one NULL group, ordered first — Spark's ASC
    // NULLS FIRST default) instead of silently dropping out of the
    // equi-join and deflating __n
    val belowR = below.withColumnRenamed(valCol, "__v")
    val ranked = df
      .join(broadcast(belowR), col(valCol) <=> col("__v"))
      .drop("__v")
      .crossJoin(broadcast(total))
      .withColumn("__r", col("__below") +
        row_number().over(
          Window.partitionBy(col(valCol)).orderBy(col(tieCol))).cast("long"))
    // ntile arithmetic in integer div; the ELSE divisor is
    // greatest(q, 1) purely to keep the never-taken q=0 branch safe
    // (when q=0 every rank satisfies the WHEN: r <= rem = N)
    ranked.withColumn("tile", expr(
        s"""CASE WHEN __r <= (__n % $k) * ((__n div $k) + 1)
           |THEN (__r - 1) div ((__n div $k) + 1) + 1
           |ELSE (__n % $k) + (__r - (__n % $k) * ((__n div $k) + 1) - 1)
           |     div greatest(__n div $k, 1) + 1 END""".stripMargin))
      .drop("__below", "__n", "__r")
  }

  /** Exact per-group WEIGHTED percentiles: the value at which the
    * cumulative weight first reaches p% of the group's total weight —
    * "the price below which 95% of shipped QUANTITY falls", the
    * inventory/traffic-weighted cousin of [[exactPercentiles]] (which
    * weights every row 1).
    *
    * Determinism without tie trouble: weights aggregate per DISTINCT
    * value first, so the cumulative-weight window walks the distinct-
    * value series — no row-order ambiguity between engines can exist,
    * and the threshold test `cw·100 ≥ p·W` is pure long arithmetic.
    * The selected value is emitted untouched.
    *
    * Scale shape: one (group, value) map-side-combined aggregate, then
    * a per-group window over DISTINCT values (value-histogram-sized,
    * not row-sized) — groups parallelize; the percent list rides as an
    * exploded literal.
    *
    * @param pcts integer percents in (0, 100]
    * @return keyCols ++ (pct, pct_value, total_w)
    */
  def weightedPercentiles(df: DataFrame, keyCols: Seq[String], valCol: String,
                          weightCol: String, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      s"percents must be in (0, 100]: $pcts")
    val keys = keyCols.map(col)
    val byVal = df
      .filter(col(valCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol).cast("long") > 0)
      .groupBy(keys :+ col(valCol): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val w = Window.partitionBy(keys: _*).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(keys: _*)
    byVal
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__tw", sum(col("__w")).over(wAll))
      .select(keys ++ Seq(col(valCol), col("__cw"), col("__tw"),
        explode(array(pcts.map(lit): _*)).as("pct")): _*)
      .filter(col("__cw") * 100 >= col("__tw") * col("pct") &&
        (col("__cw") - col("__w")) * 100 < col("__tw") * col("pct"))
      .select(keys ++ Seq(col("pct"), col(valCol).as("pct_value"),
        col("__tw").as("total_w")): _*)
  }

  /** DuckDB rendering of [[weightedPercentiles]] over `relSql`
    * projecting (keyCols..., v, w) with positive long weights. */
  def weightedPercentilesOracleSql(relSql: String, keyCols: Seq[String],
                                   pcts: Seq[Int]): String = {
    val ks = keyCols.mkString(", ")
    val pl = pcts.mkString(", ")
    s"""WITH rel AS ($relSql),
       |byval AS (SELECT $ks, v, sum(w) AS w FROM rel
       |          WHERE v IS NOT NULL AND w > 0 GROUP BY $ks, v),
       |cum AS (SELECT $ks, v, w,
       |          sum(w) OVER (PARTITION BY $ks ORDER BY v
       |                       ROWS UNBOUNDED PRECEDING) AS cw,
       |          sum(w) OVER (PARTITION BY $ks) AS tw
       |        FROM byval)
       |SELECT $ks, CAST(pct AS INT) AS pct, v AS pct_value,
       |       CAST(tw AS BIGINT) AS total_w
       |FROM cum, (SELECT unnest([$pl]) AS pct)
       |WHERE cw * 100 >= tw * pct AND (cw - w) * 100 < tw * pct
       |ORDER BY $ks, pct""".stripMargin
  }
}
