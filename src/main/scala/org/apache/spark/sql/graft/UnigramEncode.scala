package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenization as a compiled per-row
  * projection: whitespace-split the text (the [[TextCodec]] contract),
  * then segment each word into the MINIMUM-COST piece sequence by
  * Viterbi dynamic programming over the FITTED vocabulary riding along
  * as an expression constant ([[graft.operators.Unigram.train]]
  * produces (piece, cost) from the corpus; cost is the 1e6-quantized
  * negative log probability, so min-cost == max-likelihood).
  *
  * Determinism contract (replayed verbatim by the DuckDB oracle):
  *  - DP positions are Unicode CODE POINTS (DuckDB chars == code
  *    points; UTF-16 offsets would diverge on supplementary planes),
  *  - at each position the candidate (cost, start) pair is minimized
  *    with ties to the SMALLEST start — i.e. the longest final piece,
  *  - a position with NO vocabulary piece ending there falls back to
  *    a single-code-point UNK piece at `unkCost` (total coverage: the
  *    DP can never strand, every word segments).
  *
  * Concatenating a word's pieces always reconstructs the word.
  */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Long)],
                         unkCost: Long)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val costs = UnigramEncode.costTable(vocab)
  @transient private lazy val maxLen = UnigramEncode.maxPieceLen(vocab)

  def compute(s: UTF8String): ArrayData = {
    val words = TextCodec.tokenize(s)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        UnigramEncode.segmentWord(words(i), costs, maxLen, unkCost, out)
      i += 1
    }
    val arr = new Array[AnyRef](out.size)
    var k = 0
    while (k < out.size) { arr(k) = UTF8String.fromString(out.get(k)); k += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncode", this, classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {
  def apply(text: Column, vocab: Seq[(String, Long)], unkCost: Long): Column =
    ExpressionUtils.column(
      new UnigramEncode(ExpressionUtils.expression(text), vocab, unkCost))

  def costTable(
      vocab: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, c) => if (!m.containsKey(p)) m.put(p, c) }
    m
  }

  def maxPieceLen(vocab: Seq[(String, Long)]): Int =
    if (vocab.isEmpty) 1
    else vocab.iterator.map(p => p._1.codePointCount(0, p._1.length)).max

  /** Word → code-point symbol array (surrogate pairs whole — the
    * [[BpeEncode]] convention, and DuckDB's character unit). */
  def codePoints(word: String): Array[String] = {
    val out = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(word.substring(i, i + n))
      i += n
    }
    out.toArray(new Array[String](out.size))
  }

  /** Viterbi segmentation of one word; appends pieces to `out` and
    * returns the total path cost. Shared by the compiled expression
    * and the driver-side EM trainer so the two can never apply
    * different DP semantics. */
  def segmentWord(word: String,
                                 costs: java.util.HashMap[String, java.lang.Long],
                                 maxLen: Int, unkCost: Long,
                                 out: java.util.ArrayList[String]): Long = {
    val cps = codePoints(word)
    val n = cps.length
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bc = Long.MaxValue
      var bj = -1
      var j = math.max(0, i - maxLen)
      // ascending j + strict < keeps the SMALLEST j (longest piece) on
      // cost ties — the oracle's struct-min {'c', 'j'} rule
      while (j < i) {
        val piece = if (i - j == 1) cps(j) else {
          val sb = new java.lang.StringBuilder
          var t = j; while (t < i) { sb.append(cps(t)); t += 1 }
          sb.toString
        }
        val c = costs.get(piece)
        if (c != null) {
          val total = best(j) + c.longValue()
          if (total < bc) { bc = total; bj = j }
        }
        j += 1
      }
      if (bj < 0) { bc = best(i - 1) + unkCost; bj = i - 1 }
      best(i) = bc; back(i) = bj
      i += 1
    }
    // backtrack: positions n → 0
    val stack = new java.util.ArrayDeque[String]()
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      val sb = new java.lang.StringBuilder
      var t = j; while (t < pos) { sb.append(cps(t)); t += 1 }
      stack.push(sb.toString)
      pos = j
    }
    while (!stack.isEmpty) out.add(stack.pop())
    best(n)
  }
}
