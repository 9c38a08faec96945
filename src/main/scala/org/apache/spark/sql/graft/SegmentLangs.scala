package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-segment stopword-vote language ID as one compiled pass — the
  * [[WordShingles]]/[[CharNgrams]] treatment for the code-switch /
  * lang-ID hot loop. Bit-compatible with the HOF formulation
  * (`transform(sequence(1, nSeg), i => langIdTokens(slice(tokens, …)))`
  * with `langIdTokens = array_max over struct(size(filter(isin…)))`,
  * kept as `TextFunctions.segmentLangsHof` and differential-tested),
  * but the HOF tower is interpreted end-to-end and re-materializes a
  * token slice + one filtered array PER (segment, language) — the
  * round-13 sf1 gate measured q150_code_switch at ~10 minutes in it.
  * Here: one tokenize, one hash-set membership count per token, one
  * vote per segment.
  *
  * Vote semantics (identical to the HOF / the DuckDB oracles):
  * per segment count stopword hits per language; winner = the
  * lexicographically (hits, lang) GREATEST pair — i.e. max hits, ties
  * to the greatest language code; zero hits → "und". Blank text →
  * empty array; null → null. `langs` must be pre-sorted ascending by
  * code (the struct-max tie-break depends on it).
  */
case class SegmentLangs(child: Expression, window: Int,
                        langs: Seq[(String, Seq[String])])
  extends UnaryExpression with ExpectsInputTypes {

  require(window >= 1, s"window must be >= 1: $window")
  require(langs.map(_._1) == langs.map(_._1).sorted,
    "langs must be sorted ascending by code (tie-break order)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "segment_langs"

  @transient private lazy val codes: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val stopSets: Array[java.util.HashSet[String]] =
    langs.map { case (_, ws) =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")

  def compute(s: UTF8String): ArrayData = {
    val toks = TextCodec.tokenize(s)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val nLangs = codes.length
    val nSeg = (toks.length - 1) / window + 1
    val out = new Array[Any](nSeg)
    val counts = new Array[Int](nLangs)
    var seg = 0
    while (seg < nSeg) {
      java.util.Arrays.fill(counts, 0)
      var i = seg * window
      val end = math.min(i + window, toks.length)
      while (i < end) {
        var l = 0
        while (l < nLangs) {
          if (stopSets(l).contains(toks(i))) counts(l) += 1
          l += 1
        }
        i += 1
      }
      // (hits, lang)-greatest: langs ascend, so >= keeps the later code
      var bestN = 0
      var best = und
      var l = 0
      while (l < nLangs) {
        if (counts(l) > 0 && counts(l) >= bestN) {
          bestN = counts(l); best = codes(l)
        }
        l += 1
      }
      out(seg) = best
      seg += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segmentLangs", this, classOf[SegmentLangs].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SegmentLangs =
    copy(child = newChild)
}

object SegmentLangs {
  def apply(text: Column, window: Int,
            langs: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(
      new SegmentLangs(ExpressionUtils.expression(text), window, langs))
}
