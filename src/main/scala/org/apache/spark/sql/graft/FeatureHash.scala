package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Signed feature hashing ("the hashing trick", Weinberger et al.,
  * ICML 2009): a document's bag of tokens folded into a FIXED-width
  * integer vector — `vec[h_b(t) mod dim] += sign(h_s(t))` per token —
  * the collision-tolerant featurizer that lets a linear classifier /
  * similarity probe run over an unbounded vocabulary with bounded
  * state. The independent sign hash makes collisions cancel in
  * expectation (E[v_i·noise] = 0), which is what distinguishes the
  * trick from naive modulo bucketing.
  *
  * One compiled O(len + dim) pass per row, zero shuffle at any corpus
  * size — the featurization stage of a 100 TB pipeline is a pure
  * projection. Both hashes are the portable md5 prefix
  * ([[TextCodec.md5Prefix32]]) with the house seed prefix scheme
  * (`"seed:" ++ token`), so DuckDB replays every bucket and sign
  * exactly.
  *
  * Tokenization is [[TextCodec.tokenize]] (trim + whitespace split) —
  * identical to every other text operator in the library. Empty/blank
  * text → the zero vector; null → null.
  */
case class FeatureHash(child: Expression, dim: Int,
                       bucketSeed: Int, signSeed: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0, s"dim must be positive, got $dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_hash"

  def compute(s: UTF8String): GenericArrayData = {
    val toks = TextCodec.tokenize(s)
    val vec = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val bucket = (TextCodec.md5Prefix32(
        (bucketSeed + ":" + t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        % dim).toInt
      val sign = if (TextCodec.md5Prefix32(
        (signSeed + ":" + t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        % 2L == 0L) 1L else -1L
      vec(bucket) += sign
      i += 1
    }
    new GenericArrayData(vec)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureHash", this, classOf[FeatureHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): FeatureHash =
    copy(child = newChild)
}

object FeatureHash {
  def apply(text: Column, dim: Int, bucketSeed: Int, signSeed: Int): Column =
    ExpressionUtils.column(
      new FeatureHash(ExpressionUtils.expression(text), dim, bucketSeed, signSeed))
}
