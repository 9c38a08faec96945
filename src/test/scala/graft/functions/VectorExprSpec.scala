package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential tests for the batched SRP projection expression
  * (LongMatrixBits): it must be bit-identical to the per-plane
  * dot-product composition it replaced — every q32/q48 oracle hash
  * depends on that. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private val planes = 10
  private val seed = 2
  private val dims = 24

  private lazy val ws =
    Array.tabulate(planes)(p => VectorFunctions.quantizedHyperplane(seed, p, dims))

  test("LongMatrixBits == per-plane LongArrayDot composition == driver math") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dims)(rnd.nextLong() % 1000000L)))
    val rows = data.toDF("id", "qv")
    val legacy = (0 until planes).map { p =>
      when(VectorFunctions.intDot(col("qv"), lit(ws(p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val out = rows.select(col("id"),
        VectorFunctions.srpBucketQuantized(col("qv"), planes, seed, dims).as("batched"),
        legacy.as("composed"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (id, b, c) => assert(b == c, s"id=$id: $b != $c") }
    // independent driver replay
    val expect = data.map { case (id, v) =>
      id -> (0 until planes).map { p =>
        val dot = v.zip(ws(p)).map { case (x, w) => x * w }.sum
        if (dot >= 0) 1L << p else 0L
      }.sum
    }.toMap
    out.foreach { case (id, b, _) => assert(b == expect(id), s"id=$id") }
  }

  test("LongMatrixBits edges: null array -> null, short vector -> prefix") {
    val rows = Seq(
      (1L, Option(Seq(5L, -3L))), // shorter than dims: prefix semantics
      (2L, Option.empty[Seq[Long]])).toDF("id", "qv")
    val out = rows.select(col("id"),
        VectorFunctions.srpBucketQuantized(col("qv"), planes, seed, dims).as("b"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(2L).isEmpty)
    val expect = (0 until planes).map { p =>
      if (5L * ws(p)(0) + -3L * ws(p)(1) >= 0) 1L << p else 0L
    }.sum
    assert(out(1L).contains(expect))
  }
}
