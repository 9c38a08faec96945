package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts_us, user, type, value); helper renders ts as timestamp
  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))

  private val Hour = 3600L * 1000000

  test("multiTouch: first/last/linear credits on a hand-computed case") {
    // user 1: view@1h, click@2h, purchase@3h value 10.00 (1000 cents)
    // user 2: purchase@1h value 5.00 with NO touch in window
    val events = ev(Seq(
      (1L, 1 * Hour, 1L, "view", 0.0),
      (2L, 2 * Hour, 1L, "click", 0.0),
      (3L, 3 * Hour, 1L, "purchase", 10.0),
      (4L, 1 * Hour, 2L, "purchase", 5.0)))
    val out = Attribution.multiTouch(events, "user_id", "ts", "event_type",
      "event_id", "value", Seq("view", "click"), "purchase", 24 * Hour)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // (n_touchpoints, n_first, n_last, first_cents, last_cents, linear_microcents)
    assert(out("view") == ((1L, 1L, 0L, 1000L, 0L, 500000000L)))
    assert(out("click") == ((1L, 0L, 1L, 0L, 1000L, 500000000L)))
    assert(out("(none)") == ((0L, 1L, 1L, 500L, 500L, 500000000L)))
  }

  test("multiTouch: lookback window excludes stale touches; ties break by id") {
    // touch exactly AT the lookback boundary is excluded (strict >)
    val events = ev(Seq(
      (1L, 0L, 1L, "view", 0.0),
      (2L, 24 * Hour, 1L, "purchase", 1.0), // view is at cts - lookback: out
      // same-timestamp touches: first/last decided by event id
      (3L, 30 * Hour, 2L, "view", 0.0),
      (4L, 30 * Hour, 2L, "click", 0.0),
      (5L, 31 * Hour, 2L, "purchase", 2.0)))
    val out = Attribution.multiTouch(events, "user_id", "ts", "event_type",
      "event_id", "value", Seq("view", "click"), "purchase", 24 * Hour)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("(none)") == ((1L, 1L))) // user 1's conversion unattributed
    assert(out("view") == ((1L, 0L)))   // id 3 < id 4 → first
    assert(out("click") == ((0L, 1L)))  // id 4 → last
  }

  test("multiTouch: credit conservation across models") {
    val events = ev((1L to 60L).map { i =>
      val typ = (i % 4) match {
        case 0 => "purchase"; case 1 => "view"; case 2 => "click"; case _ => "signup"
      }
      (i, i * Hour / 2, i % 5, typ, if (typ == "purchase") i * 1.17 else 0.0)
    })
    val out = Attribution.multiTouch(events, "user_id", "ts", "event_type",
      "event_id", "value", Seq("view", "click", "signup"), "purchase", 6 * Hour)
      .collect()
    val totalCents = events.filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).head().getLong(0)
    assert(out.map(_.getLong(4)).sum == totalCents, "first-touch conserves value")
    assert(out.map(_.getLong(5)).sum == totalCents, "last-touch conserves value")
    // linear credit loses only the floor-division remainder: < n_conv µcents
    val nConv = events.filter(col("event_type") === "purchase").count()
    val linear = out.map(_.getLong(6)).sum
    assert(linear <= totalCents * 1000000L &&
      linear > totalCents * 1000000L - nConv * 1000000L)
  }
}
