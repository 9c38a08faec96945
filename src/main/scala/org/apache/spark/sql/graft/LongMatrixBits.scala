package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Sign-random-projection bucket as ONE matrix-vector pass: bit `p` of
  * the result = sign(v · weights(p)). Semantically identical to
  * composing `planes` separate [[LongArrayDot]]s against hyperplane
  * literals, but the vector is traversed once per plane inside a single
  * compiled loop nest — one expression, one null check, no per-plane
  * literal array re-materialization — which matters on the O(corpus)
  * signature stages of `Similarity.srpTopKQuantized` /
  * `Dedup.embeddingDuplicatesQuantized`.
  *
  * Null array → null; null elements contribute 0 (matching
  * [[LongArrayDot]]; quantized vectors contain none). Vectors shorter
  * than a plane compare on the common prefix.
  */
case class LongMatrixBits(child: Expression, weights: Array[Array[Long]])
  extends UnaryExpression with ExpectsInputTypes {

  require(weights.nonEmpty && weights.length <= 64,
    s"plane count must be in [1, 64], got ${weights.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_matrix_bits"

  def compute(a: ArrayData): Long = {
    val len = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < weights.length) {
      val w = weights(p)
      val n = math.min(len, w.length)
      var s = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) s += a.getLong(i) * w(i)
        i += 1
      }
      if (s >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longMatrixBits", this,
      classOf[LongMatrixBits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LongMatrixBits =
    copy(child = newChild)

  // structural equality over the weight matrix (the case-class default
  // compares Array references — see NearestCentroids)
  override def equals(other: Any): Boolean = other match {
    case that: LongMatrixBits =>
      child == that.child && weights.length == that.weights.length &&
        weights.indices.forall(i =>
          java.util.Arrays.equals(weights(i), that.weights(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = java.util.Objects.hashCode(child)
    weights.foreach(w => h = h * 31 + java.util.Arrays.hashCode(w))
    h
  }
}

object LongMatrixBits {
  def apply(vec: Column, weights: Array[Array[Long]]): Column =
    ExpressionUtils.column(new LongMatrixBits(
      ExpressionUtils.expression(vec), weights))
}
