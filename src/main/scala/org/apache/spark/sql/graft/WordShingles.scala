package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles as one compiled pass: overlapping k-token windows
  * re-joined by a single space; fewer than k tokens → empty array.
  *
  * Bit-compatible with the higher-order-function formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, i, k)))`
  * over `split(trim(text), "\s+")` — kept as
  * `TextFunctions.wordShinglesHof` and differential-tested in
  * TextFunctionsSpec), but ~an order of magnitude cheaper: the HOF
  * chain is interpreted and allocates several intermediate arrays per
  * row, while this runs one compiled tokenize+join loop per document —
  * shingling dominates the MinHash/Jaccard dedup operators, so this is
  * their hot inner loop.
  *
  * Exact replicated semantics (the DuckDB oracles encode them):
  * trim = strip U+0020 only (Spark `trim`); tokenize = Java regex
  * `\s+` split with limit -1 (Spark `split`), so non-space leading
  * whitespace yields a leading "" token, exactly as the HOF did;
  * blank/empty text → empty array; null text → null.
  */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  def compute(s: UTF8String): ArrayData = {
    val toks = TextCodec.tokenize(s)
    val n = toks.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    ExpressionUtils.column(new WordShingles(ExpressionUtils.expression(text), k))
}
