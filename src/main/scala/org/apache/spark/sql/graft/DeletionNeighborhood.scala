package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-neighborhood blocking keys as one compiled pass: the
  * string itself plus every delete-one-character variant,
  * de-duplicated (deleting any character of a run of equal characters
  * yields the same variant — emitting it once keeps the candidate
  * join from manufacturing duplicate pairs it must distinct away).
  *
  * Bit-compatible with the higher-order-function formulation
  * (`array_distinct(concat(array(s), transform(sequence(0, len-1),
  * i => concat(substr(s,1,i), substr(s,i+2)))))` — kept as
  * [[graft.operators.FuzzyJoin.deletionKeysHof]] and
  * differential-tested), but compiled: the HOF chain is interpreted
  * per element and allocates a sequence array, per-variant substring
  * pairs, and a distinct pass per row. This is the per-row hot loop of
  * the edit-distance-1 join (q90) — every corpus row fans out into
  * `length+1` keys before the one hash shuffle, so the generator runs
  * on every byte of the corpus.
  *
  * Dedup strategy: a variant equals the previous variant exactly when
  * the deleted character equals the previously deleted one (run of
  * equal chars), so emitting a variant only when `c(i) != c(i-1)`
  * dedups WITHOUT hashing — character comparison on code-unit level,
  * which mirrors how the HOF's array_distinct compares strings.
  * Null string → null; empty string → [""] (its own identity key).
  */
case class DeletionNeighborhood(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "deletion_neighborhood"

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[Any](n + 1)
    out.add(s)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      // a deletion inside a run of equal chars repeats the previous
      // variant — skip all but the run's first position
      if (i == 0 || str.charAt(i) != str.charAt(i - 1)) {
        sb.setLength(0)
        sb.append(str, 0, i).append(str, i + 1, n)
        out.add(UTF8String.fromString(sb.toString))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deletionNeighborhood", this,
      classOf[DeletionNeighborhood].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeletionNeighborhood =
    copy(child = newChild)
}

object DeletionNeighborhood {
  def apply(s: Column): Column =
    ExpressionUtils.column(new DeletionNeighborhood(ExpressionUtils.expression(s)))
}
