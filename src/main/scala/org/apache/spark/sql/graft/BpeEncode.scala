package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization as a compiled per-row projection:
  * whitespace-split the text (the [[TextCodec]] contract shared by
  * every text expression here), split each word into character
  * symbols, then repeatedly merge the adjacent pair with the best
  * (lowest) merge rank until no learned pair remains — classic BPE
  * inference with the FITTED merge table riding along as an expression
  * constant ([[graft.operators.Bpe.train]] produces it from the
  * corpus's distributed word-frequency table; the encode pass is what
  * runs over the corpus, shuffle-free).
  *
  * Returns the array of subword tokens for the whole text (word
  * boundaries are hard — merges never cross whitespace). Concatenating
  * a word's subwords always reconstructs the word; the differential
  * spec pins this and the reference merge behavior.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val rank: java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int]()
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!m.containsKey(p)) m.put(p, i)
    }
    m
  }

  private def encodeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    var symbols = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      // keep surrogate pairs whole — a symbol is a code point
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      symbols.add(word.substring(i, i + n))
      i += n
    }
    var done = symbols.size < 2
    while (!done) {
      var best = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < symbols.size - 1) {
        val r = rank.getOrDefault((symbols.get(j), symbols.get(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        symbols.set(bestAt, symbols.get(bestAt) + symbols.get(bestAt + 1))
        symbols.remove(bestAt + 1)
        if (symbols.size < 2) done = true
      }
    }
    var k = 0
    while (k < symbols.size) {
      out.add(UTF8String.fromString(symbols.get(k)))
      k += 1
    }
  }

  def compute(s: UTF8String): ArrayData = {
    val words = TextCodec.tokenize(s)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) encodeWord(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      new BpeEncode(ExpressionUtils.expression(text), merges))
}
