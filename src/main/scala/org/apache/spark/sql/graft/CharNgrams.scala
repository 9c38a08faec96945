package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping character n-grams as one compiled pass — the
  * [[WordShingles]] treatment applied to chrF/char-diversity's hot
  * loop. Bit-compatible with the higher-order-function formulation
  * (`transform(sequence(1, length(s) − n + 1), i => substring(s, i, n))`,
  * kept as `TextFunctions.charNgramsHof` and differential-tested), but
  * the HOF chain is interpreted (CodegenFallback) AND each
  * `substring(s, i, n)` re-scans the string from byte 0 to find char
  * i — O(len²) per document on top of per-step interpretation. The
  * round-13 sf1 gate caught q221_chrf spending 15+ minutes in exactly
  * that stack (`UTF8String.substring` under interpreted
  * `ArrayTransform`). Here: one pass to index char→byte offsets, then
  * each gram is a zero-copy byte-range wrap — O(len) per document,
  * inside whole-stage codegen.
  *
  * Semantics (the DuckDB oracles encode them): grams over CODE POINTS
  * exactly as Spark's `substring` counts them; fewer than n chars →
  * empty array; null → null.
  */
case class CharNgrams(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"ngram size n=$n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // char -> starting byte offset (one linear pass)
    var chars = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      chars += 1
    }
    val total = chars - (n - 1)
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(chars) = nb
    val out = new Array[Any](total)
    var g = 0
    while (g < total) {
      out(g) = UTF8String.fromBytes(bytes, offs(g), offs(g + n) - offs(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgrams", this, classOf[CharNgrams].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(new CharNgrams(ExpressionUtils.expression(text), n))
}
