package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D cell — the layout key behind
  * locality-preserving multi-dimensional clustering (Hilbert 1891;
  * clustering analysis in Moon et al., IEEE TKDE 2001: the Hilbert
  * curve needs strictly fewer contiguous index runs to cover an
  * axis-aligned query box than the Morton/Z curve, because EVERY pair
  * of consecutive indexes is a unit grid step — Z-order jumps).
  *
  * The mapping is the textbook iterative quadrant walk: per bit plane
  * s = 2^(bits−1) … 1, the quadrant (rx, ry) contributes
  * s²·((3·rx) XOR ry) and the residual coordinates rotate/reflect into
  * the sub-square's frame:
  * {{{
  *   rx = (x & s) != 0;  ry = (y & s) != 0
  *   d += s*s * ((3*rx) ^ ry)
  *   xl = x & (s-1); yl = y & (s-1)          // canonical residuals
  *   if (ry == 0) { if (rx == 1) { xl = s-1-xl; yl = s-1-yl }; swap }
  * }}}
  * Pure integer arithmetic (bits ≤ 31 per axis, d < 2^(2·bits) fits a
  * long), compiled as an inline whole-stage-codegen loop — cheap
  * enough for the write path of a 100 TB table, deterministic
  * cross-engine (the oracle unrolls the same rounds as a CTE chain).
  *
  * Inputs are cell ranks already quantized to [0, 2^bits); values are
  * masked to the grid defensively. Null in → null out.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"need 1..31 bits per axis, got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.compute(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
      val xl = ctx.freshName("hxl"); val yl = ctx.freshName("hyl")
      val t = ctx.freshName("ht")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $xv & ${mask}L; long $y = $yv & ${mask}L; long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  long $xl = $x & ($s - 1L); long $yl = $y & ($s - 1L);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $xl = $s - 1L - $xl; $yl = $s - 1L - $yl; }
         |    long $t = $xl; $xl = $yl; $yl = $t;
         |  }
         |  $x = $xl; $y = $yl;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Interpreted twin of the codegen loop — also the driver-side
    * reference the spec checks exhaustively. */
  def compute(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = xIn & mask; var y = yIn & mask; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      var xl = x & (s - 1L); var yl = y & (s - 1L)
      if (ry == 0L) {
        if (rx == 1L) { xl = s - 1L - xl; yl = s - 1L - yl }
        val t = xl; xl = yl; yl = t
      }
      x = xl; y = yl
      s >>= 1
    }
    d
  }

  def apply(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(new HilbertIndex(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}
