package graft.operators

import graft.SparkSpec

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf2: exact integer fusion, one-sided docs contribute one term") {
    val a = Seq((1, 10L, 1), (1, 11L, 2)).toDF("qid", "doc", "rank")
    val b = Seq((1, 11L, 1), (1, 12L, 2)).toDF("qid", "doc", "rank")
    val out = RankFusion.rrf2(a, b, Seq("qid"), "doc", c = 60, topK = 10)
      .collect().map(r => r.getLong(2) -> (r.getInt(1), r.getLong(3))).toMap
    val s = RankFusion.RrfScale
    // doc 11: rank 2 in a + rank 1 in b → highest
    assert(out(11L)._2 == s / 62 + s / 61)
    assert(out(10L)._2 == s / 61 && out(12L)._2 == s / 62)
    assert(out(11L)._1 == 1 && out(10L)._1 == 2 && out(12L)._1 == 3)
  }

  test("rrf2: ties break by doc id; topK cuts") {
    val a = Seq((1, 5L, 1), (1, 9L, 2), (1, 3L, 3)).toDF("qid", "doc", "rank")
    val b = Seq((1, 9L, 1), (1, 5L, 2), (1, 7L, 3)).toDF("qid", "doc", "rank")
    // docs 5 and 9 both score s/61 + s/62 — tie, doc 5 first
    val out = RankFusion.rrf2(a, b, Seq("qid"), "doc", topK = 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(2)).toSeq == Seq(5L, 9L))
  }

  test("rrf2: null ranks surface for one-sided candidates") {
    val a = Seq((1, 10L, 1)).toDF("qid", "doc", "rank")
    val b = Seq((1, 20L, 1)).toDF("qid", "doc", "rank")
    val rows = RankFusion.rrf2(a, b, Seq("qid"), "doc").collect()
    val byDoc = rows.map(r => r.getLong(2) -> (r.isNullAt(4), r.isNullAt(5))).toMap
    assert(byDoc(10L) == (false, true) && byDoc(20L) == (true, false))
  }
}
