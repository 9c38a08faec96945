package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-level Shannon entropy — the classic cheap
  * gibberish/boilerplate detector (near-zero entropy = one repeated
  * character, i.e. padding/separator junk; unusually high entropy =
  * base64/minified/binary-ish spans masquerading as text). One
  * compiled pass per row, zero shuffle at any corpus size.
  *
  * Exactness discipline (the BLEU/ROUGE rule): the only transcendental
  * is `ln` of an INTEGER count, floor-quantized to micro-nats
  * immediately — `lnq(k) = floor(10⁶·ln k)` — and the entropy is then
  * assembled from integers only:
  *
  *   H_unano = max(0, n·lnq(n) − Σ_c k_c·lnq(k_c)) div n
  *
  * which is the exact-integer evaluation of the identity
  * H = ln n − (1/n)·Σ p_c·ln k_c·n/… re-arranged so no ratio is ever
  * materialized as a float. A last-ulp `ln` divergence between engines
  * would need the true value of `10⁶·ln k` within ~10⁻⁹ of an integer
  * to flip a floor — ln k is irrational for every integer k ≥ 2, and
  * the double error is ~10⁻¹⁰ relative, so the quantized values are
  * engine-stable. The max(0, ·) clamp removes the one case where floor
  * noise could push the (mathematically ≥ 0) numerator to −n.
  *
  * Characters are Unicode CODE POINTS of the raw text (no trim) —
  * identical to DuckDB's `string_split(text, '')` on data without
  * combining sequences. Counting uses an open-addressing int table
  * sized to the text, so per-row cost is O(len), no boxing.
  *
  * Returns struct(n_chars, distinct_chars, entropy_unano); empty text
  * → (0, 0, 0); null → null.
  */
case class CharEntropy(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("entropy_unano", LongType, nullable = false)))
  override def prettyName: String = "char_entropy"

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // open addressing on code points; capacity > 2×distinct ≥ 2×len slots
    var cap = Integer.highestOneBit(math.max(4, str.length * 2) - 1) << 1
    if (cap < 8) cap = 8
    val keys = new Array[Int](cap) // 0 = empty (code point 0 remapped)
    val cnts = new Array[Long](cap)
    val shift = 32 - Integer.numberOfTrailingZeros(cap)
    var n = 0L
    var distinct = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      val key = cp + 1 // reserve 0 as the empty slot marker
      var slot = (key * 0x9E3779B9.toInt) >>> shift // Fibonacci hash, Int domain
      while (keys(slot) != 0 && keys(slot) != key) slot = (slot + 1) & (cap - 1)
      if (keys(slot) == 0) { keys(slot) = key; distinct += 1L }
      cnts(slot) += 1L
    }
    var sum = 0L
    var j = 0
    while (j < cap) {
      val k = cnts(j)
      if (k > 0L) sum += k * CharEntropy.lnq(k)
      j += 1
    }
    val ent = if (n == 0L) 0L
      else math.max(0L, n * CharEntropy.lnq(n) - sum) / n
    InternalRow(n, distinct, ent)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** floor(10⁶ · ln k) — the shared quantization both engines apply
    * before any arithmetic touches the value. */
  def lnq(k: Long): Long = math.floor(1e6 * math.log(k.toDouble)).toLong

  def apply(text: Column): Column =
    ExpressionUtils.column(new CharEntropy(ExpressionUtils.expression(text)))
}
