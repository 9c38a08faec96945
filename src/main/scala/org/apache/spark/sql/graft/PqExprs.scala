package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Compiled kernels of the product-quantization tier
  * (`graft.operators.Pq`). The HOF formulations
  * (`transform`/`array_min`/`aggregate` with codebook literals) are
  * CodegenFallback in Spark — every lambda step is interpreted with
  * per-step allocation, which dominates corpus-sized encode and
  * (candidate × query) ADC scans. Each expression here is the exact
  * integer-arithmetic twin of its HOF predecessor (kept private in Pq
  * for differential testing): same longs, same strictly-less argmin
  * with ties to the lower index, so codes, distances, and oracle
  * replays are bit-identical.
  */

/** PQ codes of a quantized vector: per subspace s, the argmin centroid
  * by reduced distance bb − 2·(slice·cent) — identical ordering and
  * tie rule (lower code) to `array_min` over (d, c) structs. One
  * compiled pass, O(m·k·dsub) per row. Null input → null. */
case class PqCodes(child: Expression, cents: Array[Array[Array[Long]]])
  extends UnaryExpression with ExpectsInputTypes {

  require(cents.nonEmpty && cents.forall(_.nonEmpty))

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  /** Per-centroid squared norms, precomputed once per instance. */
  @transient private lazy val bb: Array[Array[Long]] =
    cents.map(_.map(c => { var s = 0L; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))

  def compute(a: ArrayData): ArrayData = {
    val m = cents.length
    val dsub = cents(0)(0).length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cs = cents(s); val bs = bb(s)
      val off = s * dsub
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var dot = 0L
        var j = 0
        while (j < dsub) { dot += a.getLong(off + j) * cent(j); j += 1 }
        val d = bs(c) - 2L * dot
        if (d < bestD) { bestD = d; best = c } // strict: ties → lower c
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def apply(qv: Column, cents: Array[Array[Array[Long]]]): Column =
    ExpressionUtils.column(new PqCodes(ExpressionUtils.expression(qv), cents))
}

/** Index of the nearest centroid by reduced integer distance
  * bb − 2·(vec·cent), ties to the lower index — the IVF cell argmin
  * in exact long arithmetic. Null input → null. */
case class LongNearestCentroid(child: Expression, cents: Array[Array[Long]])
  extends UnaryExpression with ExpectsInputTypes {

  require(cents.nonEmpty)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_nearest_centroid"

  @transient private lazy val bb: Array[Long] =
    cents.map(c => { var s = 0L; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s })

  def compute(a: ArrayData): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val k = math.min(a.numElements(), cent.length)
      var dot = 0L
      var j = 0
      while (j < k) { dot += a.getLong(j) * cent(j); j += 1 }
      val d = bb(c) - 2L * dot
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCent", this,
      classOf[LongNearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LongNearestCentroid =
    copy(child = newChild)
}

object LongNearestCentroid {
  def apply(qv: Column, cents: Array[Array[Long]]): Column =
    ExpressionUtils.column(new LongNearestCentroid(
      ExpressionUtils.expression(qv), cents))
}

/** Σ_s table[s·stride + idx(s)] — the ADC inner loop: `idx` is a code
  * array (one code per subspace), `table` the per-query lookup table
  * of reduced subspace distances laid out subspace-major with
  * `stride = table.length / idx.length`. Compiled m-lookup sum per
  * row; either side null → null. */
case class StridedIndexSum(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "strided_index_sum"

  def compute(idx: ArrayData, table: ArrayData): Long = {
    val m = idx.numElements()
    if (m == 0) return 0L
    val stride = table.numElements() / m
    var s = 0
    var acc = 0L
    while (s < m) {
      acc += table.getLong(s * stride + idx.getInt(s))
      s += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stridedSum", this,
      classOf[StridedIndexSum].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StridedIndexSum =
    copy(left = newLeft, right = newRight)
}

object StridedIndexSum {
  def apply(codes: Column, table: Column): Column =
    ExpressionUtils.column(new StridedIndexSum(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(table)))
}
