package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private val history = Seq(
    ("d1", 10L), ("d1", 20L), ("d2", 5L)
  ).toDF("day", "v")
  private val batch = Seq(
    ("d2", 7L), ("d3", 100L) // existing key grows, new key appears
  ).toDF("day", "v")

  private val aggs = Seq(
    ("total", sum($"v"), sum($"total")),
    ("n", count(lit(1)), sum($"n")))

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("day").agg(sum($"v").as("total"), count(lit(1)).as("n"))

  test("maintain(state, batch) == full recompute over history ∪ batch") {
    val maintained = MaterializedAgg
      .maintain(rollup(history), batch, Seq("day"), aggs)
      .as[(String, Long, Long)].collect().toSet
    val full = rollup(history.union(batch))
      .as[(String, Long, Long)].collect().toSet
    assert(maintained == full)
    assert(maintained == Set(("d1", 30L, 2L), ("d2", 12L, 2L), ("d3", 100L, 1L)))
  }

  test("maintenance steps compose") {
    val b1 = Seq(("d1", 1L)).toDF("day", "v")
    val b2 = Seq(("d1", 2L), ("d4", 4L)).toDF("day", "v")
    val twice = MaterializedAgg.maintain(
      MaterializedAgg.maintain(rollup(history), b1, Seq("day"), aggs),
      b2, Seq("day"), aggs)
      .as[(String, Long, Long)].collect().toSet
    val full = rollup(history.union(b1).union(b2))
      .as[(String, Long, Long)].collect().toSet
    assert(twice == full)
  }

  test("empty batch is a no-op") {
    val out = MaterializedAgg
      .maintain(rollup(history), batch.limit(0), Seq("day"), aggs)
      .as[(String, Long, Long)].collect().toSet
    assert(out == rollup(history).as[(String, Long, Long)].collect().toSet)
  }
}
