package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** `private[sql]` escape hatch collected in one place: Column ↔
  * Expression conversion and temp-function registration for sessions
  * that were not built with `spark.sql.extensions`. */
object GraftFunctionBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert a Column's node tree into a catalyst Expression.
    * `ExpressionUtils.expression` only wraps the node lazily — fine
    * inside a normal plan, but a function-registry builder's output is
    * spliced into an already-analyzing tree, where the wrapper then
    * fails codegen. The converter produces the real tree (containing
    * UnresolvedFunction nodes the analyzer resolves as usual). */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def registerTemp(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Extract a foldable integer argument (e.g. the `k` in
    * `graft_word_shingles(text, 3)`). */
  def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }

  /** Extract a foldable array-of-strings argument (e.g. the merge
    * table in `graft_bpe_encode(text, array('t h', 'th e'))`). */
  def litStringSeq(e: Expression, what: String): Seq[String] = {
    require(e.foldable, s"$what must be a literal array of strings")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          require(!a.isNullAt(i), s"$what must not contain nulls")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal array of strings, got $other")
    }
  }

  def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  def ident(name: String): FunctionIdentifier = FunctionIdentifier(name)
}
