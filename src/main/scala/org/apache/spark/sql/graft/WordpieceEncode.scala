package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT
  * vocabulary format) as a compiled per-row projection: whitespace
  * words (the [[TextCodec]] contract), each segmented by GREEDY
  * LONGEST-MATCH-FIRST against a fixed vocabulary — the first piece
  * matches bare, every continuation piece carries the `##` prefix; a
  * word with no match at any position becomes the single `unkToken`
  * (whole-word UNK, the reference behavior).
  *
  * Unlike BPE inference, the merge ORDER is irrelevant at encode time
  * — only the vocabulary SET matters — which is why greedy
  * longest-match is the standard deployment form. The vocabulary rides
  * along as an expression constant (plain Seq → structural equality,
  * Catalyst canonicalization unaided); matching is a hash-set probe
  * per candidate length, O(len · maxPieceLen) per word, zero shuffle.
  */
case class WordpieceEncode(child: Expression, vocab: Seq[String],
                           unkToken: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val table = WordpieceEncode.vocabTable(vocab)

  def compute(s: UTF8String): ArrayData = {
    val pieces = WordpieceEncode.encodeText(s, table, unkToken)
    val out = new Array[AnyRef](pieces.size)
    var i = 0
    while (i < pieces.size) {
      out(i) = UTF8String.fromString(pieces.get(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceEncode", this,
      classOf[WordpieceEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceEncode =
    copy(child = newChild)
}

object WordpieceEncode {
  def apply(text: Column, vocab: Seq[String],
            unkToken: String = "[UNK]"): Column =
    ExpressionUtils.column(
      new WordpieceEncode(ExpressionUtils.expression(text), vocab, unkToken))

  /** (piece set, max BARE piece length, max CONTINUATION content
    * length) — the probe structure both the expression and the driver
    * replica share. */
  private[graft] final class Table(
      val pieces: java.util.HashSet[String],
      val maxBare: Int, val maxCont: Int)

  private[graft] def vocabTable(vocab: Seq[String]): Table = {
    val set = new java.util.HashSet[String]()
    var maxBare = 0
    var maxCont = 0
    vocab.foreach { p =>
      if (p.nonEmpty && set.add(p)) {
        if (p.startsWith("##")) {
          val c = p.length - 2
          if (c > maxCont) maxCont = c
        } else if (p.length > maxBare) maxBare = p.length
      }
    }
    new Table(set, maxBare, maxCont)
  }

  private[graft] def encodeText(s: UTF8String, table: Table,
                                unk: String): java.util.ArrayList[String] = {
    val words = TextCodec.tokenize(s)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) encodeWord(words(i), table, unk, out)
      i += 1
    }
    out
  }

  /** Greedy longest-match-first: at each position try the longest
    * candidate down to one character; continuation candidates probe
    * the set WITH their `##` prefix, so a bare piece can never match
    * mid-word (and vice versa). Any dead end → the whole word is one
    * UNK token. Positions advance by whole matched pieces, so
    * surrogate pairs can only cross a boundary if the vocabulary
    * itself contains an ill-formed piece. */
  private def encodeWord(word: String, table: Table, unk: String,
                         out: java.util.ArrayList[String]): Unit = {
    val n = word.length
    val start = out.size()
    var pos = 0
    var dead = false
    while (pos < n && !dead) {
      val maxLen = math.min(n - pos, if (pos == 0) table.maxBare else table.maxCont)
      var len = maxLen
      var matched: String = null
      while (len >= 1 && matched == null) {
        val cand =
          if (pos == 0) word.substring(0, len)
          else "##" + word.substring(pos, pos + len)
        if (table.pieces.contains(cand)) matched = cand
        else len -= 1
      }
      if (matched == null) dead = true
      else {
        out.add(matched)
        pos += len
      }
    }
    if (dead) {
      // roll back partial pieces: the whole word is one UNK
      while (out.size() > start) out.remove(out.size() - 1)
      out.add(unk)
    }
  }
}
