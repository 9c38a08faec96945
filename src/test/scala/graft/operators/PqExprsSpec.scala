package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.graft.{LongNearestCentroid, PqCodes, StridedIndexSum}
import graft.SparkSpec


class PqExprsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic "random" vectors: dims=8, values spread over ± range
  private val dims = 8
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(dims)(j => (((seed * 1103515245L + j * 12345L) % 2000L) - 1000L) / 500.0f)
  private lazy val corpus =
    (0L until 64L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
  private lazy val cb = Pq.train(corpus, "vec_id", "embedding", m = 4, k = 8, dims = dims)

  test("PqCodes is bit-identical to the HOF array_min formulation") {
    val qv = transform(col("embedding"), x =>
      floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val both = corpus.select(
      PqCodes(qv, cb.cents).as("fast"),
      Pq.codesExprHof(Pq.slicesColForTest(qv, cb), cb).as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"codes ${r.getSeq[Int](0)} vs HOF ${r.getSeq[Int](1)}")
    }
  }

  test("PqCodes ties break to the lower code like array_min") {
    // duplicate centroids in every subspace: codes must pick index 0
    val dup = cb.cents.map(sub => sub.map(_ => sub(0)))
    val qv = transform(col("embedding"), x =>
      floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val got = corpus.limit(5).select(PqCodes(qv, dup).as("c")).collect()
    got.foreach(r => assert(r.getSeq[Int](0).forall(_ == 0)))
  }

  test("LongNearestCentroid matches the struct-min HOF argmin") {
    val cents = Array.tabulate(6)(i => vec(i * 7L).map(x => (x * 1e6).toLong))
    val cc = typedlit(cents.map(_.toSeq).toSeq)
    val ccBB = typedlit(cents.map(c => c.map(x => x * x).sum).toSeq)
    val qv = transform(col("embedding"), x =>
      floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val hof = array_min(transform(sequence(lit(0), lit(cents.length - 1)), ci =>
      struct((element_at(ccBB, ci + lit(1)) - lit(2L) *
        VectorFunctions.intDot(qv, element_at(cc, ci + lit(1))))
        .as("d"), ci.as("c")))).getField("c")
    val both = corpus.select(
      LongNearestCentroid(qv, cents).as("fast"), hof.as("hof")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("StridedIndexSum equals the aggregate fold over the table") {
    val table = (0L until 32L).map(i => i * i - 7L) // stride 8, m 4
    val rows = Seq(Seq(0, 3, 7, 1), Seq(2, 2, 2, 2), Seq(7, 0, 5, 6))
      .toDF("codes")
      .select(col("codes").cast("array<int>").as("codes"),
        typedlit(table).as("tab"))
    val got = rows.select(
      StridedIndexSum(col("codes"), col("tab")).as("fast"),
      aggregate(sequence(lit(0), lit(3)), lit(0L), (acc, s) => acc +
        element_at(col("tab"), s * 8 + element_at(col("codes"), s + 1) + 1))
        .as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("adcTopK end-to-end unchanged: all-candidate ADC equals exact brute order") {
    // the PqSpec invariant re-checked through the new kernels: with
    // m·k sized to reconstruct well, top-1 self-hit must hold
    val out = Pq.adcTopK(corpus.filter(col("vec_id") < 3),
      Pq.encode(corpus, "vec_id", "embedding", cb),
      "vec_id", "embedding", cb, 1).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(2),
      s"query ${r.getLong(0)} top-1 is ${r.getLong(2)}"))
  }
}
