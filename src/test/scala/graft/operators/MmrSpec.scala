package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query along dim 0; ids 1-3 nearly identical (high mutual sim),
  // id 4 orthogonal-ish, id 5 anti-correlated
  private val q = Array(1000000L, 0L, 0L)
  private lazy val cands = Seq(
    (1L, Array(0.9f, 0.01f, 0.0f)),
    (2L, Array(0.89f, 0.0f, 0.01f)),
    (3L, Array(0.88f, 0.01f, 0.01f)),
    (4L, Array(0.1f, 0.9f, 0.0f)),
    (5L, Array(0.05f, 0.0f, 0.9f))).toDF("vec_id", "embedding")

  test("selectTopK: pure relevance (lambda=100) returns the relevance order") {
    val out = Mmr.selectTopK(cands, "vec_id", "embedding", q, k = 3, lambdaPct = 100)
      .collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("selectTopK: diversity penalty breaks up the near-duplicate block") {
    // λ=30%: the near-dups' mutual sim (~0.8 dot) dwarfs the diverse
    // candidates' small relevance deficit, so 4 and 5 displace 2 and 3
    val out = Mmr.selectTopK(cands, "vec_id", "embedding", q, k = 3, lambdaPct = 30)
      .collect().map(_.getLong(1))
    assert(out.head == 1L, "first pick is pure relevance")
    assert(out.toSet == Set(1L, 4L, 5L))
  }

  test("selectTopK matches a driver-side greedy replay") {
    val vecs = cands.select(col("vec_id"),
      VectorFunctions.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val lam = 70L
    var selected = Vector.empty[Long]
    val expected = (1 to 4).map { _ =>
      val best = vecs.keys.toSeq.filterNot(selected.contains)
        .map { id =>
          val ms = if (selected.isEmpty) 0L
          else selected.map(s => dot(vecs(id), vecs(s))).max
          (id, lam * dot(vecs(id), q) - (100 - lam) * ms)
        }.minBy { case (id, score) => (-score, id) }
      selected :+= best._1
      best
    }
    val got = Mmr.selectTopK(cands, "vec_id", "embedding", q, k = 4, lambdaPct = 70)
      .collect().map(r => (r.getLong(1), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  test("selectTopK: deterministic across partitionings") {
    val a = Mmr.selectTopK(cands, "vec_id", "embedding", q, k = 4, lambdaPct = 70)
      .collect().toSeq
    val b = Mmr.selectTopK(cands.repartition(5), "vec_id", "embedding", q,
      k = 4, lambdaPct = 70).collect().toSeq
    assert(a == b)
  }
}
