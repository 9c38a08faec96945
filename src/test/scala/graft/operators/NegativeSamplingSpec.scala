package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  /** Ring positions / probe targets exactly as the operator computes
    * them, read back through the same hash column. */
  private def positions(ids: Seq[Long], seed: Int): Map[Long, Long] =
    ids.toDF("id").select($"id",
      graft.functions.TextFunctions.portableHash(
        concat(lit(s"$seed:"), $"id".cast("string"))).as("h"))
      .as[(Long, Long)].collect().toMap

  private def targets(ids: Seq[Long], k: Int, seed: Int): Map[(Long, Int), Long] =
    ids.flatMap(a => (1 to k).map(j => (a, j))).toDF("a", "j")
      .select($"a", $"j", graft.functions.TextFunctions.portableHash(
        concat(lit("neg"), $"j".cast("string"), lit(s":$seed:"),
          $"a".cast("string"))).as("t"))
      .as[(Long, Int, Long)].collect()
      .map { case (a, j, t) => (a, j) -> t }.toMap

  private def bruteSuccessor(ring: Map[Long, Long], t: Long): (Long, Long) = {
    val atOrAbove = ring.filter(_._2 >= t)
    val pool = if (atOrAbove.nonEmpty) atOrAbove else ring
    val pos = pool.values.min
    (pool.filter(_._2 == pos).keys.min, pos)
  }

  test("randomized differential: successor == brute force, wrap-around included") {
    val rnd = new scala.util.Random(59)
    for (round <- 1 to 3) {
      val ids = (1 to 40 + rnd.nextInt(60)).map(_ => rnd.nextLong().abs % 1000000).distinct
      val anchors = ids.filter(_ % 3 == 0)
      if (anchors.nonEmpty) {
        val ring = positions(ids, seed = round)
        val ts = targets(anchors, k = 3, seed = round)
        val expect = ts.map { case ((a, j), t) =>
          val (nid, npos) = bruteSuccessor(ring, t)
          (a, j, nid, npos)
        }.toSet
        val got = NegativeSampling.hashRingNegatives(
          ids.toDF("id").repartition(7), anchors.toDF("id"), "id",
          k = 3, seed = round)
          .as[(Long, Int, Long, Long)].collect().toSet
        assert(got == expect, s"round $round diverged")
      }
    }
  }

  test("deterministic: identical output across partition layouts and reruns") {
    val ids = (1L to 300L).toSeq
    val a = NegativeSampling.hashRingNegatives(
      ids.toDF("id").repartition(13), ids.take(30).toDF("id"), "id", 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    val b = NegativeSampling.hashRingNegatives(
      ids.toDF("id").coalesce(1), ids.take(30).toDF("id"), "id", 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(a == b && a.size == 120)
  }

  test("negatives are spread, not a single hot row") {
    val ids = (1L to 500L).toSeq
    val negs = NegativeSampling.hashRingNegatives(
      ids.toDF("id"), ids.filter(_ % 5 == 0).toDF("id"), "id", 4)
      .select("negative_id").distinct().count()
    assert(negs > 100, s"only $negs distinct negatives for 400 draws")
  }
}
