package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom membership probe as a compiled per-row projection: k
  * Kirsch–Mitzenmacher bit positions from ONE md5 pass against a
  * driver-built bitmap riding along as a literal reference object.
  *
  * This is the semi-join pre-filter primitive: at 100 TB you don't
  * join a fact table against a selective dim to find the 2% of rows
  * that match — you broadcast a few KB of bloom state and drop 98% of
  * the fact inside the scan's projection, BEFORE any exchange, then
  * exact-join only the survivors. The probe never shuffles, never
  * explodes rows, and stays inside whole-stage codegen; false
  * positives (bounded by the m/k choice) cost only wasted join work,
  * never a wrong answer — the filter admits a superset.
  *
  * Bit-for-bit compatible with the Column-side builder
  * (`Sketches.bloomBits`) and the DuckDB oracle: both derive positions
  * `(h1 + i·((h2 mod m)|1)) mod m` from the same "blm:"-prefixed md5
  * hex pair ([[TextCodec.md5Pair60]]). Null key → null.
  */
case class BloomContains(child: Expression, bits: Array[Long], k: Int, m: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && m >= 2 && m % 64 == 0, s"need k>=1, m>=2 divisible by 64 (got k=$k m=$m)")
  require(bits.length == m / 64, s"bitmap length ${bits.length} != m/64 = ${m / 64}")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  def compute(s: UTF8String): Boolean = {
    val key = ("blm:" + s.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val (a, b) = TextCodec.md5Pair60(key)
    val h1 = a % m
    val h2 = (b % m) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) % m).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)

  // the case-class equals/hashCode would compare the Array field by
  // reference — defeating Catalyst canonicalization/CSE. Structural.
  override def equals(other: Any): Boolean = other match {
    case that: BloomContains =>
      child == that.child && k == that.k && m == that.m &&
        java.util.Arrays.equals(bits, that.bits)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k), Integer.valueOf(m)) * 31 +
      java.util.Arrays.hashCode(bits)
}

object BloomContains {
  def apply(key: Column, bits: Array[Long], k: Int, m: Int): Column =
    ExpressionUtils.column(new BloomContains(
      ExpressionUtils.expression(key.cast("string")), bits, k, m))
}
