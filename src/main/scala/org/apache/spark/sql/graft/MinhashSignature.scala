package org.apache.spark.sql.graft


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** MinHash signature over a shingle array as one compiled pass:
  * sig[i] = min over shingles of (a_i · (md5_32(s) mod P) + b_i) mod P.
  *
  * Bit-compatible with the interpreted HOF fold (kept as
  * `TextFunctions.minhashSignatureHof`, differential-tested) and with
  * the explode+groupBy aggregation it replaces in `Dedup`: one md5 per
  * shingle, n running minima updated in registers. As a per-row
  * projection the signature stage costs ZERO shuffle — the groupBy
  * shape shuffled a row per document and burned the agg machinery on
  * what is a tight loop.
  *
  * Null input → null; empty shingle set → null (the HOF contract);
  * null elements are skipped (as `least(m, null)` did).
  */
case class MinhashSignature(child: Expression, a: Seq[Long], b: Seq[Long],
                            p: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(a.length == b.length && a.nonEmpty, "need one (a, b) pair per hash")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set → null
  override def prettyName: String = "minhash_signature"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  def compute(arr: ArrayData): Any = {
    val m = arr.numElements()
    if (m == 0) return null
    val n = aArr.length
    val mins = Array.fill(n)(p)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val h = TextCodec.md5Prefix32(arr.getUTF8String(i).getBytes) % p
        var j = 0
        while (j < n) {
          val v = (h * aArr(j) + bArr(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(x: Any): Any = compute(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSignature].getName)
    nullSafeCodeGen(ctx, ev, x => s"""
       |Object r = $ref.compute($x);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  def apply(shingles: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(new MinhashSignature(
      ExpressionUtils.expression(shingles), a, b, p))
}
