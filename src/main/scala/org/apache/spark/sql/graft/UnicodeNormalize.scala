package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a compiled per-row
  * projection — Spark has no built-in for it, and a Scala UDF would
  * break whole-stage codegen around the hottest text-cleaning stage.
  *
  * `java.text.Normalizer` implements the Unicode standard annex #15,
  * the same algorithm DuckDB's `nfc_normalize` (utf8proc) implements,
  * so NFC output is oracle-comparable cross-engine.
  *
  * The already-normalized fast path matters at scale: real corpora are
  * overwhelmingly NFC already, and `Normalizer.isNormalized` is a scan
  * with no allocation — the rewrite cost is only paid by rows that
  * actually need it. Null → null; the empty string is its own
  * normalization.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_$form"

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, nf)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, nf))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this,
      classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def apply(text: Column, form: String): Column = {
    require(Forms.contains(form), s"form must be one of $Forms, got $form")
    ExpressionUtils.column(
      new UnicodeNormalize(ExpressionUtils.expression(text), form))
  }
}
