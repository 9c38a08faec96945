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

  @transient private lazy val rank = BpeEncode.rankTable(merges)

  def compute(s: UTF8String): ArrayData = {
    val subwords = BpeEncode.encodeText(s, rank)
    val out = new Array[AnyRef](subwords.size)
    var i = 0
    while (i < subwords.size) {
      out(i) = UTF8String.fromString(subwords.get(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** The id-emitting variant: same whitespace-word BPE merge loop, but
  * each subword maps through a FIXED vocabulary to its integer id
  * (`unkId` for out-of-vocabulary subwords) inside the same compiled
  * projection — token ids with zero shuffle and no per-row join. The
  * vocabulary is a plain Seq (structural equality, so Catalyst
  * canonicalization works unaided). */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                        vocab: Seq[String], unkId: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val rank = BpeEncode.rankTable(merges)
  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    vocab.zipWithIndex.foreach { case (s, i) =>
      if (!m.containsKey(s)) m.put(s, i)
    }
    m
  }

  def compute(s: UTF8String): ArrayData = {
    val subwords = BpeEncode.encodeText(s, rank)
    val out = new Array[Int](subwords.size)
    var i = 0
    while (i < subwords.size) {
      val id = ids.get(subwords.get(i))
      out(i) = if (id == null) unkId else id.intValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeIds", this, classOf[BpeEncodeIds].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeEncode {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      new BpeEncode(ExpressionUtils.expression(text), merges))

  private[graft] def rankTable(
      merges: Seq[(String, String)]): java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!m.containsKey(p)) m.put(p, i)
    }
    m
  }

  /** Whitespace words of `s`, each run through the lowest-rank-first
    * merge loop; subwords concatenated in word order. Shared by the
    * string- and id-emitting expressions so the two can never apply
    * different merge semantics. */
  private[graft] def encodeText(
      s: UTF8String,
      rank: java.util.HashMap[(String, String), Integer]): java.util.ArrayList[String] = {
    val words = TextCodec.tokenize(s)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) encodeWord(words(i), rank, out)
      i += 1
    }
    out
  }

  private def encodeWord(word: String,
                         rank: java.util.HashMap[(String, String), Integer],
                         out: java.util.ArrayList[String]): Unit = {
    val symbols = new java.util.ArrayList[String](word.length)
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
        val r = rank.get((symbols.get(j), symbols.get(j + 1)))
        if (r != null && r.intValue() < best) { best = r.intValue(); bestAt = j }
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
      out.add(symbols.get(k))
      k += 1
    }
  }
}

object BpeEncodeIds {
  def apply(text: Column, merges: Seq[(String, String)], vocab: Seq[String],
            unkId: Int = -1): Column =
    ExpressionUtils.column(
      new BpeEncodeIds(ExpressionUtils.expression(text), merges, vocab, unkId))
}
