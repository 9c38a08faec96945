package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution: credit each conversion's value to
  * the touch events that preceded it inside a lookback window, under
  * the three standard models at once — first-touch, last-touch, and
  * linear — so one pass yields the whole comparison dashboard.
  *
  * The reference's warehouse feeds exactly this kind of downstream
  * BI computation (vivek-neenopal/shopify-etl's Power BI layer); here
  * it is an engine operator over any (user, ts, type, value) stream.
  *
  * Determinism: conversion value is quantized to integer cents
  * (`floor(value·100)` on the IEEE double — identical in any engine),
  * linear credit uses floor division `cents·10⁶ div n_touches` in
  * micro-cents (the dropped remainder is < n·10⁻⁶ cents per
  * conversion and identically dropped by the oracle), and first/last
  * ranks break timestamp ties by event id, a total order.
  *
  * Scale shape: ONE shuffle — the conversion↔touch pairing is a hash
  * equi-join on the user key with the lookback as a residual range
  * predicate, so data moves once however long the stream is. Pair
  * fan-out is bounded by touches-per-user-per-lookback (a product
  * contract, not a data accident); a pathological always-on user is
  * the classic skew key and can be salted with [[SkewJoin]] if one
  * appears. No window in the plan spans more than one conversion's
  * touch list.
  */
object Attribution {

  /** Per-touch-type credit table. Conversions with NO touch in the
    * window surface as `touch_type = '(none)'` so every model's
    * column sums to the same total credited cents (conservation —
    * asserted in AttributionSpec).
    *
    * Output: `touch_type, n_touchpoints, n_first, n_last,
    * first_cents, last_cents, linear_microcents`, ordered by type.
    */
  def multiTouch(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, idCol: String, valueCol: String,
                 touchTypes: Seq[String], conversionType: String,
                 lookbackMicros: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type")
    require(lookbackMicros > 0, s"lookbackMicros must be positive: $lookbackMicros")

    val us = unix_micros(col(tsCol))
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("__u"), us.as("__cts"),
        col(idCol).as("__cid"),
        floor(col(valueCol) * lit(100)).cast("long").as("__cents"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__tu"), us.as("__tts"),
        col(idCol).as("__tid"), col(typeCol).as("__ttype"))

    // one hash shuffle on the user key; lookback is a residual filter
    val paired = conv.join(touch,
      conv("__u") === touch("__tu") &&
        touch("__tts") <= conv("__cts") &&
        touch("__tts") > conv("__cts") - lit(lookbackMicros),
      "left")

    val perConv = Window.partitionBy(col("__cid"))
    val asc = perConv.orderBy(col("__tts").asc, col("__tid").asc)
    val desc = perConv.orderBy(col("__tts").desc, col("__tid").desc)
    val credited = paired
      .withColumn("__n", count(col("__tid")).over(perConv))
      .withColumn("__rn_first", row_number().over(asc))
      .withColumn("__rn_last", row_number().over(desc))
      // a conversion with zero touches keeps its single null-touch row
      // and carries full credit under every model
      .withColumn("__ttype", coalesce(col("__ttype"), lit("(none)")))
      .withColumn("__nn", greatest(col("__n"), lit(1L)))

    credited.groupBy(col("__ttype").as("touch_type"))
      .agg(
        sum(when(col("__tid").isNotNull, 1L).otherwise(0L)).as("n_touchpoints"),
        sum(when(col("__rn_first") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("__rn_last") === 1, 1L).otherwise(0L)).as("n_last"),
        sum(when(col("__rn_first") === 1, col("__cents")).otherwise(0L))
          .as("first_cents"),
        sum(when(col("__rn_last") === 1, col("__cents")).otherwise(0L))
          .as("last_cents"),
        sum(expr("(__cents * 1000000L) div __nn")).as("linear_microcents"))
      .orderBy("touch_type")
  }

  /** DuckDB replica of [[multiTouch]] for the oracle: identical cents
    * quantization, identical floor division, identical tie-breaks. */
  def multiTouchOracleSql(eventsSql: String, touchTypes: Seq[String],
                          conversionType: String, lookbackMicros: Long): String = {
    val touchList = touchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH ev AS ($eventsSql),
       |conv AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS cts,
       |                event_id AS cid,
       |                CAST(floor(value * 100) AS BIGINT) AS cents
       |         FROM ev WHERE event_type = '$conversionType'),
       |touch AS (SELECT user_id AS tu, epoch_us(CAST(ts AS TIMESTAMP)) AS tts,
       |                 event_id AS tid, event_type AS ttype
       |          FROM ev WHERE event_type IN ($touchList)),
       |paired AS (
       |  SELECT conv.*, touch.tts, touch.tid, touch.ttype
       |  FROM conv LEFT JOIN touch
       |    ON touch.tu = conv.u
       |   AND touch.tts <= conv.cts
       |   AND touch.tts > conv.cts - ${lookbackMicros}
       |),
       |ranked AS (
       |  SELECT *,
       |    count(tid) OVER (PARTITION BY cid) AS n,
       |    row_number() OVER (PARTITION BY cid ORDER BY tts ASC, tid ASC) AS rf,
       |    row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC) AS rl
       |  FROM paired)
       |SELECT COALESCE(ttype, '(none)') AS touch_type,
       |  CAST(sum(CASE WHEN tid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_touchpoints,
       |  CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       |  CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
       |  CAST(sum(CASE WHEN rf = 1 THEN cents ELSE 0 END) AS BIGINT) AS first_cents,
       |  CAST(sum(CASE WHEN rl = 1 THEN cents ELSE 0 END) AS BIGINT) AS last_cents,
       |  CAST(sum((cents * 1000000) // greatest(n, 1)) AS BIGINT) AS linear_microcents
       |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
