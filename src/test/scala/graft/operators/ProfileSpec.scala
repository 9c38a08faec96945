package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass profiler: exact accounting, estimate accuracy in both HLL
  * regimes, and partitioning independence. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("counts, nulls, exact distinct, and small-range estimate are exact") {
    val df = Seq(
      ("a", Some(1)), ("b", Some(2)), ("a", None), ("c", Some(2)))
      .toDF("s", "n")
    val p = Profile.profile(df, Seq("s" -> col("s"), "n" -> col("n")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p("s") == (4L, 0L, 3L, 3L))   // small-range HLL is near-exact
    assert(p("n")._1 == 4L && p("n")._2 == 1L && p("n")._3 == 2L &&
      p("n")._4 == 2L)
  }

  test("high-cardinality estimate lands within HLL error bounds") {
    val df = (1 to 20000).map(i => s"val$i").toDF("k")
    val est = Profile.profile(df, Seq("k" -> col("k")))
      .head().getLong(4)
    // sigma ~ 1.04/sqrt(1024) ~ 3.3%; allow 3 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.10, s"estimate $est")
  }

  test("profile is independent of partitioning") {
    val df = (1 to 5000).map(i => (s"k${i % 997}", i % 13)).toDF("a", "b")
    val cols = Seq("a" -> col("a"), "b" -> col("b"))
    val x = Profile.profile(df, cols).collect().map(_.toSeq).toSet
    val y = Profile.profile(df.repartition(17), cols).collect().map(_.toSeq).toSet
    assert(x == y)
  }
}
