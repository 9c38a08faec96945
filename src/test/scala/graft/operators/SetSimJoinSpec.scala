package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, Seq[String])], thrPpm: Long) = {
    val sets = docs.map { case (id, ts) => (id, ts.toSet) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 1000000L >= thrPpm * uni
    } yield (ia, ib, inter, uni, inter * 1000000L / uni)).toSet
  }

  test("prefix join ≡ brute force across thresholds (completeness + exactness)") {
    val rnd = new scala.util.Random(7)
    val alphabet = (0 until 60).map(i => s"tok$i")
    // clustered docs: near-dups share a base set with small mutations
    val docs = (0 until 40).flatMap { g =>
      val base = rnd.shuffle(alphabet).take(5 + rnd.nextInt(12))
      (0 until (1 + rnd.nextInt(3))).map { v =>
        val drop = if (base.size > 2) rnd.nextInt(2) else 0
        val mutated = base.drop(drop) ++ Seq.fill(rnd.nextInt(2))(
          alphabet(rnd.nextInt(alphabet.size)))
        ((g * 10 + v).toLong, mutated)
      }
    }
    val df = docs.toDF("id", "toks")
    for (thr <- Seq(400000L, 500000L, 700000L, 900000L)) {
      val got = SetSimJoin.prefixJaccardJoin(df, "id", "toks", thr)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == brute(docs, thr), s"thr=$thr")
    }
  }

  test("duplicate tokens dedup; empty sets drop; identical sets hit 10^6 ppm") {
    val df = Seq(
      (1L, Seq("a", "a", "b", "b", "c")),
      (2L, Seq("c", "b", "a")),
      (3L, Seq.empty[String]),
      (4L, Seq("z"))).toDF("id", "toks")
    val got = SetSimJoin.prefixJaccardJoin(df, "id", "toks", 1000000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L, 3L, 1000000L)))
  }

  test("threshold 10^6 keeps only exact set equality") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
    assert(SetSimJoin.prefixJaccardJoin(df, "id", "toks", 1000000L).count() == 0)
    assert(SetSimJoin.prefixJaccardJoin(df, "id", "toks", 750000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 3L, 4L, 750000L)))
  }
}
