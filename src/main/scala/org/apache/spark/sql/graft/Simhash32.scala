package org.apache.spark.sql.graft


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a document as one compiled pass: tokenize
  * (identical semantics to [[WordShingles]]' tokenizer), hash each
  * token with the portable md5-derived 32-bit hash, accumulate the 32
  * ±1 bit counters, recompose.
  *
  * Bit-compatible with the interpreted HOF formulation (kept as
  * `TextFunctions.simhash32Hof`, differential-tested) and with the
  * explode+groupBy operator path it replaces in `Dedup` — but as a
  * per-row projection: at 100 TB the signature stage costs ZERO
  * shuffle, where the explode path shuffled one row per token into the
  * 32-counter aggregation.
  *
  * Empty/blank text → all 32 counters are 0 → every bit "≥ 0" → sig =
  * 2³²−1 (the HOF fixed point); null → null.
  */
case class Simhash32(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  def compute(s: UTF8String): Long = {
    val toks = TextCodec.tokenize(s)
    val counts = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = TextCodec.md5Prefix32(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 32) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash32", this, classOf[Simhash32].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  def apply(text: Column): Column =
    ExpressionUtils.column(new Simhash32(ExpressionUtils.expression(text)))
}
