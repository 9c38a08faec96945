package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))

  private val Steps = Seq("view", "click", "buy")

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Funnel.steps(ev(rows), "user_id", "ts", "event_type", "event_id", Steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("steps: strict ordering — a click before the first view does not chain") {
    val out = run(Seq(
      (1L, 100L, 1L, "click"), // before any view: must not count as step 2
      (2L, 200L, 1L, "view"),
      (3L, 300L, 1L, "click"),
      (4L, 400L, 1L, "buy")))
    assert(out.toSeq == Seq(
      (1L, "view", 1L, 0L), (2L, "click", 1L, 100L), (3L, "buy", 1L, 100L)))
  }

  test("steps: same-timestamp events do not chain (strictly after)") {
    val out = run(Seq(
      (1L, 100L, 1L, "view"),
      (2L, 100L, 1L, "click"), // same µs as the view: not strictly after
      (3L, 500L, 2L, "view"),
      (4L, 600L, 2L, "click")))
    assert(out.toSeq == Seq((1L, "view", 2L, 0L), (2L, "click", 1L, 100L)))
  }

  test("steps: greedy earliest chain equals the chained-min semantics; reach is monotone") {
    // user 1 completes; user 2 stops at click; user 3 only views;
    // user 4 has buy before click (no completion)
    val out = run(Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "buy"),
      (4L, 10L, 2L, "view"), (5L, 25L, 2L, "click"),
      (6L, 10L, 3L, "view"),
      (7L, 10L, 4L, "view"), (8L, 15L, 4L, "buy"), (9L, 20L, 4L, "click")))
    assert(out.map(_._3).toSeq == Seq(4L, 3L, 1L), "reach 4 → 3 → 1")
    val reach = out.map(_._3)
    assert(reach.zip(reach.tail).forall { case (a, b) => a >= b })
  }

  test("steps: later view can still enable the chain (greedy exchange property)") {
    // the SECOND view is the one the click follows; greedy takes the
    // first view but the click at 300 is still strictly after it
    val out = run(Seq(
      (1L, 100L, 1L, "view"), (2L, 250L, 1L, "view"), (3L, 300L, 1L, "click")))
    assert(out.toSeq == Seq((1L, "view", 1L, 0L), (2L, "click", 1L, 200L)))
  }
}
