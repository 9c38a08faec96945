package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.DataFrame

class RangeBinJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](enabled: Boolean)(body: => A): A = {
    GraftExtensions.register(spark)
    spark.conf.set("spark.graft.rangeJoin.enabled", enabled.toString)
    try body finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  private lazy val intervals = {
    val rnd = new scala.util.Random(3)
    (1 to 150).map { i =>
      val s = rnd.nextInt(600) - 300
      (i.toLong, s.toLong, (s + rnd.nextInt(40)).toLong) // some empty
    }.toDF("iid", "s", "e")
  }
  private lazy val points = {
    val rnd = new scala.util.Random(5)
    (1 to 200).map(j => (j.toLong, (rnd.nextInt(700) - 350).toLong))
      .toDF("pid", "p")
  }

  private def sandwichJoin(): DataFrame =
    intervals.join(points,
      intervals("s") <= points("p") && points("p") < intervals("e"))

  test("the rule rewrites the nested-loop range join into a bin equi-join") {
    withRule(enabled = true) {
      val df = sandwichJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      assert(plan.contains("__graft_bin"), s"no bin key in plan:\n$plan")
    }
  }

  test("rewritten results equal the nested-loop results exactly") {
    val expected = withRule(enabled = false) {
      val df = sandwichJoin()
      assert(df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin")) // the baseline really is the slow plan
      df.select("iid", "pid").as[(Long, Long)].collect().toSorted
    }
    for (w <- Seq("1", "16", "1024", "100000")) {
      val got = withRule(enabled = true) {
        spark.conf.set("spark.graft.rangeJoin.binWidth", w)
        try sandwichJoin().select("iid", "pid").as[(Long, Long)].collect().toSorted
        finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
      }
      assert(got == expected, s"binWidth=$w")
    }
  }

  test("does not fire when an equality conjunct is present") {
    withRule(enabled = true) {
      val a = Seq((1L, 0L, 10L, "k")).toDF("iid", "s", "e", "ka")
      val b = Seq((2L, 5L, "k")).toDF("pid", "p", "kb")
      val df = a.join(b, a("ka") === b("kb") && a("s") <= b("p") && b("p") < a("e"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
      assert(df.count() == 1)
    }
  }

  test("does not fire on non-long domains") {
    withRule(enabled = true) {
      val a = Seq((1L, 0.5, 10.5)).toDF("iid", "s", "e")
      val b = Seq((2L, 5.0)).toDF("pid", "p")
      val df = a.join(b, a("s") <= b("p") && b("p") < a("e"))
      assert(!df.queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(df.count() == 1)
    }
  }

  test("null endpoints and points match nothing, same as the nested loop") {
    withRule(enabled = true) {
      val a = Seq((1L, Some(0L), Some(10L)), (2L, None, Some(9L)))
        .toDF("iid", "s", "e")
      val b = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "p")
      val got = a.join(b, a("s") <= b("p") && b("p") < a("e"))
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 1L)))
    }
  }

  private implicit class Sortable(xs: Array[(Long, Long)]) {
    def toSorted: List[(Long, Long)] = xs.toList.sorted
  }
}
