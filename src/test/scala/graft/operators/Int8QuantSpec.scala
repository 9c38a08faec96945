package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Int8QuantSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embeddings: value depends only on (id, dim)
  private def vec(id: Long, dims: Int): Array[Float] =
    Array.tabulate(dims)(d => (((id * 31 + d * 17) % 97) - 48) / 50.0f)

  private lazy val emb = (0L until 40L).map(i => (i, vec(i, 8)))
    .toDF("vec_id", "embedding")

  test("codebook covers per-dim min/max; codes stay in [0, 255]") {
    val (mins, ranges) = Int8Quant.collectCodebook(
      Int8Quant.codebook(emb, "embedding"))
    assert(mins.length == 8 && ranges.forall(_ >= 1))
    val codes = emb.select(explode(
      Int8Quant.encodeExpr(col("embedding"), mins, ranges)).as("c"))
      .agg(min("c"), max("c")).head()
    assert(codes.getLong(0) >= 0 && codes.getLong(1) <= 255)
    // extremes map to the rails: some dim realizes both 0 and 255
    assert(codes.getLong(0) == 0 && codes.getLong(1) == 255)
  }

  test("reconReport: round-trip error bounded by range/255 per coordinate") {
    val rep = Int8Quant.reconReport(emb, "embedding").collect()
    assert(rep.length == 8)
    val n = emb.count()
    rep.foreach { r =>
      val (minQ, maxQ, sumAbsErr) = (r.getLong(1), r.getLong(2), r.getLong(4))
      val step = math.max(maxQ - minQ, 1L) / 255.0
      assert(sumAbsErr <= n * (step + 1.0),
        s"dim ${r.getLong(0)}: sum_abs_err $sumAbsErr exceeds n·(range/255+1)")
    }
  }

  test("codeTopK matches a driver-side brute force on the same codes") {
    val (mins, ranges) = Int8Quant.collectCodebook(
      Int8Quant.codebook(emb, "embedding"))
    val codes = emb.select(col("vec_id"),
      Int8Quant.encodeExpr(col("embedding"), mins, ranges).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val got = Int8Quant.codeTopK(queries, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = codes.keys.toSeq.filter(_ % 10 == 0).sorted.flatMap { q =>
      codes.toSeq.filter(_._1 != q)
        .map { case (id, c) => (id, dot(codes(q), c)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, s), i) => (q, (i + 1).toLong, id, s) }
    }
    assert(got.toSeq == expected)
  }

  test("recallVsExact: one row per query, overlap bounded, replay matches") {
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val out = Int8Quant.recallVsExact(queries, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(0L, 10L, 20L, 30L))
    out.foreach { case (_, overlap, ppm) =>
      assert(overlap >= 0 && overlap <= 5 && ppm == overlap * 1000000L / 5)
    }
    // replay: intersect driver-side exact and code rankings
    val (mins, ranges) = Int8Quant.collectCodebook(
      Int8Quant.codebook(emb, "embedding"))
    val codes = emb.select(col("vec_id"),
      Int8Quant.encodeExpr(col("embedding"), mins, ranges).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val exact = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    def topk(vecs: Map[Long, Array[Long]], q: Long) =
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, dot(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    out.foreach { case (q, overlap, _) =>
      assert(overlap == (topk(exact, q) intersect topk(codes, q)).size)
    }
  }

  test("determinism: codes independent of partitioning") {
    val (mins, ranges) = Int8Quant.collectCodebook(
      Int8Quant.codebook(emb, "embedding"))
    val a = emb.select(col("vec_id"),
      Int8Quant.encodeExpr(col("embedding"), mins, ranges).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = emb.repartition(7).select(col("vec_id"),
      Int8Quant.encodeExpr(col("embedding"), mins, ranges).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }
}
