package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Term-frequency counts of N fixed terms in one compiled pass:
  * tokenize (identical semantics to [[Simhash32]] / [[WordShingles]]
  * via [[TextCodec]]), bucket each token through a prebuilt term→index
  * hash map, return `array<long>` of length N+1 — counts for each
  * term in the given order, then the TOTAL token count (the document
  * length every tf·idf-style scorer also needs) at index N.
  *
  * This is the scan side of driver-known-term retrieval
  * (`graft.operators.Bm25.topK`): the term set rides along as an
  * expression constant, the corpus is scanned once with ZERO shuffle
  * and O(|text|) per-row cost, and only (doc, term) hits ever become
  * rows downstream. The higher-order-function formulation
  * (`size(filter(tokens, _ === t))` per term) is CodegenFallback in
  * Spark — interpreted, re-tokenizing per term; this expression
  * replaces T+1 interpreted passes with one compiled one.
  *
  * Null input → null; blank text → all-zero counts with dl 0.
  * Duplicate terms count into the FIRST occurrence's slot (callers
  * dedupe; the guard keeps the contract total-count-preserving).
  */
case class TokenTermCounts(child: Expression, terms: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  require(terms.nonEmpty, "need at least one term")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_term_counts"

  /** Built once per expression instance; shared across rows/tasks via
    * the codegen references array. */
  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](terms.length * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      if (!m.containsKey(t)) m.put(t, Integer.valueOf(i))
    }
    m
  }

  def compute(s: UTF8String): ArrayData = {
    val toks = TextCodec.tokenize(s)
    val out = new Array[Long](terms.length + 1)
    var i = 0
    while (i < toks.length) {
      val j = index.get(toks(i))
      if (j != null) out(j.intValue) += 1L
      i += 1
    }
    out(terms.length) = toks.length.toLong
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenTermCounts", this,
      classOf[TokenTermCounts].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTermCounts =
    copy(child = newChild)
}

object TokenTermCounts {
  def apply(text: Column, terms: Seq[String]): Column =
    ExpressionUtils.column(new TokenTermCounts(
      ExpressionUtils.expression(text), terms))
}
