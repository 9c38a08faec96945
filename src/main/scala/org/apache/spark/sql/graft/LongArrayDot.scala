package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Codegen'd integer dot product over two `array<long>` columns.
  *
  * The higher-order-function route
  * (`aggregate(zip_with(a, b, _*_), 0, _+_)`) falls back to interpreted
  * evaluation and allocates an intermediate array per row — dominating
  * cost on O(pairs) similarity joins (`graft.operators.Similarity`).
  * This expression compiles to a tight primitive loop inside
  * whole-stage codegen (no allocation) — the "custom Catalyst
  * Expression beats UDF" path for the one hot spot built-ins can't
  * cover.
  *
  * Lives under `org.apache.spark.sql.*` because `AbstractDataType` and
  * the Column↔Expression bridge (`classic.ExpressionUtils`) are
  * `private[sql]` in Spark 4.
  *
  * Null array → null; null elements contribute 0 (quantized vectors
  * contain none).
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed locals: two dots in one codegen context
      // (cosine needs three) would otherwise redefine `i` and throw the
      // whole stage back to interpreted evaluation
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(new LongArrayDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
