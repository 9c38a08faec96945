package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Which of N fixed patterns occur as substrings of the input — one
  * compiled pass per distinct pattern LENGTH (Rabin–Karp rolling hash
  * with exact verification on hash hits), not one `instr` scan per
  * pattern. Returns the sorted array of matching pattern indexes
  * (empty array when nothing matches; null input → null).
  *
  * This is the probe side of substring-level decontamination: the
  * pattern set (e.g. verbatim benchmark spans) rides along as an
  * expression constant, the corpus is scanned once with zero shuffle,
  * and per-row cost is O(|text| · distinct-lengths + matches) instead
  * of O(|text| · patterns). Exactness: a hash hit is confirmed with a
  * direct character comparison, so output is exactly "pattern is a
  * substring" — no false positives to re-verify downstream.
  *
  * Patterns are matched on Java chars (UTF-16 code units), which for
  * valid inputs equals substring-of-codepoints; the empty pattern is
  * rejected (it would match everything vacuously).
  */
case class MultiPatternMatch(child: Expression, patterns: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern would match everything")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "multi_pattern_match"

  private val Base = 257L

  /** Per distinct length: (length, B^(L-1), hash → patterns-with-index).
    * Built once per expression instance; shared across rows/tasks via
    * the codegen references array. */
  @transient private lazy val byLength: Array[(Int, Long, java.util.HashMap[Long, Array[(Int, String)]])] =
    patterns.zipWithIndex.groupBy(_._1.length).toArray.sortBy(_._1).map {
      case (len, ps) =>
        var pow = 1L
        var i = 1
        while (i < len) { pow *= Base; i += 1 }
        val m = new java.util.HashMap[Long, Array[(Int, String)]]()
        ps.foreach { case (p, idx) =>
          val h = hashOf(p)
          val prev = m.getOrDefault(h, Array.empty)
          m.put(h, prev :+ (idx -> p))
        }
        (len, pow, m)
    }

  private def hashOf(p: String): Long = {
    var h = 0L
    var i = 0
    while (i < p.length) { h = h * Base + p.charAt(i); i += 1 }
    h
  }

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    var found: java.util.TreeSet[Int] = null
    var g = 0
    while (g < byLength.length) {
      val (len, pow, m) = byLength(g)
      if (len <= n) {
        var h = 0L
        var i = 0
        while (i < len) { h = h * Base + str.charAt(i); i += 1 }
        var start = 0
        var continue = true
        while (continue) {
          val hits = m.get(h)
          if (hits != null) {
            var j = 0
            while (j < hits.length) {
              val (idx, p) = hits(j)
              if (str.regionMatches(start, p, 0, len)) {
                if (found == null) found = new java.util.TreeSet[Int]()
                found.add(idx)
              }
              j += 1
            }
          }
          if (start + len < n) {
            h = (h - str.charAt(start) * pow) * Base + str.charAt(start + len)
            start += 1
          } else continue = false
        }
      }
      g += 1
    }
    if (found == null) new GenericArrayData(Array.empty[Int])
    else {
      val out = new Array[Int](found.size)
      val it = found.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPatternMatch", this,
      classOf[MultiPatternMatch].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternMatch =
    copy(child = newChild)
}

object MultiPatternMatch {
  def apply(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      new MultiPatternMatch(ExpressionUtils.expression(text), patterns))
}

/** [[MultiPatternMatch]]'s counting sibling: how many times each of N
  * fixed patterns occurs in the input, at EVERY start position
  * (overlapping occurrences count — the multi-keyword tagging /
  * topic-scoring semantics, where frequency weights matter and
  * "aaa" contains "aa" twice). Same Rabin–Karp structure: one pass
  * per distinct pattern LENGTH with exact verification on hash hits,
  * O(|text| · distinct-lengths + matches) per row, zero shuffle.
  * Returns a long array aligned with the pattern list (all zeros when
  * nothing matches; null input → null).
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern would match everywhere")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_pattern_count"

  private val Base = 257L

  @transient private lazy val byLength: Array[(Int, Long, java.util.HashMap[Long, Array[(Int, String)]])] =
    patterns.zipWithIndex.groupBy(_._1.length).toArray.sortBy(_._1).map {
      case (len, ps) =>
        var pow = 1L
        var i = 1
        while (i < len) { pow *= Base; i += 1 }
        val m = new java.util.HashMap[Long, Array[(Int, String)]]()
        ps.foreach { case (p, idx) =>
          var h = 0L
          var j = 0
          while (j < p.length) { h = h * Base + p.charAt(j); j += 1 }
          val prev = m.getOrDefault(h, Array.empty)
          m.put(h, prev :+ (idx -> p))
        }
        (len, pow, m)
    }

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val counts = new Array[Long](patterns.length)
    var g = 0
    while (g < byLength.length) {
      val (len, pow, m) = byLength(g)
      if (len <= n) {
        var h = 0L
        var i = 0
        while (i < len) { h = h * Base + str.charAt(i); i += 1 }
        var start = 0
        var continue = true
        while (continue) {
          val hits = m.get(h)
          if (hits != null) {
            var j = 0
            while (j < hits.length) {
              val (idx, p) = hits(j)
              if (str.regionMatches(start, p, 0, len)) counts(idx) += 1L
              j += 1
            }
          }
          if (start + len < n) {
            h = (h - str.charAt(start) * pow) * Base + str.charAt(start + len)
            start += 1
          } else continue = false
        }
      }
      g += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPatternCount", this,
      classOf[MultiPatternCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {
  def apply(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      new MultiPatternCount(ExpressionUtils.expression(text), patterns))
}
