package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-neighborhood blocking keys as one compiled pass: the
  * string itself plus every variant obtainable by deleting up to
  * `radius` characters, de-duplicated (deleting different characters
  * of a run yields the same variant — emitting it once keeps the
  * candidate join from manufacturing duplicate pairs it must distinct
  * away).
  *
  * Two strings with `lev(s,t) <= radius` always share a key (the
  * FastSS alignment argument: each edit touches at most one character
  * per side, so a common `<= radius`-deletion subsequence exists), so
  * the key join is a complete candidate generator for edit distance
  * `<= radius`.
  *
  * For radius 1, bit-compatible with the higher-order-function
  * formulation (`array_distinct(concat(array(s), transform(...)))` —
  * kept as [[graft.operators.FuzzyJoin.deletionKeysHof]] and
  * differential-tested), but compiled: the HOF chain is interpreted
  * per element and allocates a sequence array, per-variant substring
  * pairs, and a distinct pass per row. This is the per-row hot loop of
  * the fuzzy joins (q90/q101) — every corpus row fans out into
  * `O(length^radius)` keys before the one hash shuffle, so the
  * generator runs on every byte of the corpus.
  *
  * Dedup: radius 1 needs no hashing — a variant repeats exactly when
  * the deleted character equals the previously deleted one (run of
  * equal chars), so only a run's first position emits. Radius >= 2
  * dedups through a LinkedHashSet (duplicates across deletion-position
  * pairs are not run-local). Null string → null; empty string → [""].
  */
case class DeletionNeighborhood(child: Expression, radius: Int = 1)
  extends UnaryExpression with ExpectsInputTypes {

  require(radius >= 1 && radius <= 2, s"radius=$radius must be 1 or 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "deletion_neighborhood"

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (radius == 1) return computeR1(s, str, n)
    // radius 2: delete-0, delete-1 and delete-2 variants, set-deduped
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(str)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(str, 0, i).append(str, i + 1, n)
      val d1 = sb.toString
      seen.add(d1)
      var j = 0
      val m = d1.length
      while (j < m) {
        sb.setLength(0)
        sb.append(d1, 0, j).append(d1, j + 1, m)
        seen.add(sb.toString)
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  private def computeR1(s: UTF8String, str: String, n: Int): ArrayData = {
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
  def apply(s: Column): Column = apply(s, 1)
  def apply(s: Column, radius: Int): Column =
    ExpressionUtils.column(new DeletionNeighborhood(ExpressionUtils.expression(s), radius))
}
