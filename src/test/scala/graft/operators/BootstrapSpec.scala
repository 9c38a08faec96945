package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  // independent reference for the whole draw chain
  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }
  private def weight(id: String, rep: Long): Long = {
    val h = hash32(id) % Bootstrap.P
    val u0 = (h + rep * Bootstrap.RepSpread) % Bootstrap.P
    val u1 = (u0 * Bootstrap.MulA) % Bootstrap.P
    val u = (u1 * Bootstrap.MulB) % Bootstrap.P
    Bootstrap.PoissonCum.count(u >= _).toLong
  }

  private val rows = (1L to 400L).map(i =>
    (if (i % 2 == 0) "a" else "b", i, 1000L + (i % 7) * 10))
    .toDF("grp", "id", "v")

  test("matches a full driver-side replay of draws, means, and ranks") {
    val reps = 50
    val out = Bootstrap.groupMeanCi(rows, "grp", "id", "v",
      reps = reps, loRank = 2, hiRank = 49)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val data = (1L to 400L).map(i =>
      (if (i % 2 == 0) "a" else "b", i, 1000L + (i % 7) * 10))
    val expected = data.groupBy(_._1).map { case (g, xs) =>
      val n = xs.size.toLong
      val meanQ = (1000000L * xs.map(_._3).sum) / n
      val repMeans = (0 until reps).flatMap { rep =>
        val ws = xs.map(x => (weight(x._2.toString, rep.toLong), x._3))
        val sw = ws.map(_._1).sum
        if (sw == 0) None
        else Some((rep.toLong, (1000000L * ws.map(w => w._1 * w._2).sum) / sw))
      }
      val sorted = repMeans.sortBy { case (rep, m) => (m, rep) }.map(_._2)
      g -> ((n, meanQ, sorted(1), sorted(48))) // ranks 2 and 49, 1-based
    }
    assert(out === expected)
  }

  test("deterministic across runs and input partitionings") {
    val a = Bootstrap.groupMeanCi(rows.repartition(13), "grp", "id", "v",
      reps = 40, loRank = 1, hiRank = 40).collect().map(_.toSeq).toSet
    val b = Bootstrap.groupMeanCi(rows.coalesce(1), "grp", "id", "v",
      reps = 40, loRank = 1, hiRank = 40).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("interval brackets the point estimate; draws are Poisson(1)-shaped") {
    val out = Bootstrap.groupMeanCi(rows, "grp", "id", "v").collect()
    out.foreach { r =>
      val (m, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= m && m <= hi, s"CI [$lo, $hi] misses point $m")
      assert(lo < hi)
    }
    // marginal weight distribution over 400 x 200 draws: P(w=0) = 1/e
    val zeros = (for { i <- 1L to 400L; rep <- 0L until 200L }
      yield weight(i.toString, rep)).count(_ == 0L)
    val frac = zeros.toDouble / (400 * 200)
    assert(math.abs(frac - 0.3679) < 0.02,
      s"w=0 fraction $frac far from 1/e — draw uniformity broken")
  }

  test("rank bounds are validated loudly") {
    val ex = intercept[IllegalArgumentException] {
      Bootstrap.groupMeanCi(rows, "grp", "id", "v", reps = 10,
        loRank = 5, hiRank = 11)
    }
    assert(ex.getMessage.contains("loRank"))
  }
}
