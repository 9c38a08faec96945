package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval matches exactly the inequality join") {
    val rnd = new scala.util.Random(11)
    val intervals = (1 to 200).map { i =>
      val s = rnd.nextInt(1000) - 500 // negatives too
      (i.toLong, s.toLong, (s + rnd.nextInt(50)).toLong) // may be empty
    }
    val points = (1 to 300).map(j => (j.toLong, (rnd.nextInt(1100) - 550).toLong))
    val idf = intervals.toDF("iid", "s", "e")
    val pdf = points.toDF("pid", "p")
    val expected = (for {
      (iid, s, e) <- intervals
      (pid, p) <- points
      if p >= s && p < e
    } yield (iid, pid)).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalPointJoin(idf, pdf, "s", "e", "p", w)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"binWidth=$w")
    }
  }

  test("interval overlap matches the inequality join, each pair once") {
    val rnd = new scala.util.Random(23)
    val as = (1 to 120).map { i =>
      val s = rnd.nextInt(400) - 200
      (i.toLong, s.toLong, (s + 1 + rnd.nextInt(40)).toLong)
    }
    val bs = (1 to 120).map { j =>
      val s = rnd.nextInt(400) - 200
      (j.toLong, s.toLong, (s + 1 + rnd.nextInt(40)).toLong)
    }
    val adf = as.toDF("aid", "as", "ae")
    val bdf = bs.toDF("bid", "bs", "be")
    val expected = (for {
      (aid, s1, e1) <- as
      (bid, s2, e2) <- bs
      if s1 < e2 && s2 < e1
    } yield (aid, bid)).toList.sorted
    for (w <- Seq(3L, 16L, 500L)) {
      val got = RangeJoin.intervalOverlapJoin(adf, bdf, "as", "ae", "bs", "be", w)
        .select("aid", "bid").as[(Long, Long)].collect().toList.sorted
      assert(got == expected, s"binWidth=$w (duplicates or misses)")
    }
  }

  test("keyed interval overlap: pairs meet only within their key, each once") {
    val rnd = new scala.util.Random(41)
    val as = (1 to 150).map { i =>
      val s = rnd.nextInt(300)
      (i.toLong, (i % 5).toLong, s.toLong, (s + 1 + rnd.nextInt(30)).toLong)
    }
    val bs = (1 to 150).map { j =>
      val s = rnd.nextInt(300)
      (j.toLong, (j % 5).toLong, s.toLong, (s + 1 + rnd.nextInt(30)).toLong)
    }
    val adf = as.toDF("aid", "ak", "as", "ae")
    val bdf = bs.toDF("bid", "bk", "bs", "be")
    val expected = (for {
      (aid, ak, s1, e1) <- as
      (bid, bk, s2, e2) <- bs
      if ak == bk && s1 < e2 && s2 < e1
    } yield (aid, bid)).toList.sorted
    for (w <- Seq(4L, 32L)) {
      val got = RangeJoin.intervalOverlapJoin(adf, bdf, "as", "ae", "bs", "be",
          w, keyPairs = Seq(("ak", "bk")))
        .select("aid", "bid").as[(Long, Long)].collect().toList.sorted
      assert(got == expected, s"binWidth=$w (cross-key leak, dup or miss)")
    }
  }

  test("plans a hash join on the bin key, not a nested loop") {
    val idf = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val pdf = (1L to 100L).map(p => (p, p)).toDF("pid", "p")
    val plan = RangeJoin.intervalPointJoin(idf, pdf, "s", "e", "p", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("rejects colliding column names and non-positive widths") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalPointJoin(df, df, "s", "e", "a", 10L)
    }
    val pdf = Seq((1L, 1L)).toDF("pid", "p")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalPointJoin(df, pdf, "s", "e", "p", 0L)
    }
  }

  test("null endpoints and null points drop out") {
    val idf = Seq((1L, Some(0L), Some(10L)), (2L, None, Some(5L)))
      .toDF("iid", "s", "e")
    val pdf = Seq((1L, Some(3L)), (2L, None)).toDF("pid", "p")
    val got = RangeJoin.intervalPointJoin(idf, pdf, "s", "e", "p", 4L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }
}
