package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** The `n` nearest centroid indices for a vector, by squared L2
  * distance (ties → lower index), as a per-row projection.
  *
  * This is the shuffle-free IVF cell-assignment primitive: the naive
  * plan (`crossJoin(broadcast(centroids))` + `row_number() over
  * partitionBy(id)`) materializes corpus×nCells rows and full-shuffles
  * them just to compute a per-row argmin — at 100 TB that shuffle is
  * nCells× the corpus. Here the centroids ride along as a literal
  * reference object and the argmin happens inside the projection, so
  * cell assignment costs zero shuffle and stays in whole-stage codegen
  * (the generated code calls [[compute]], a compiled JVM method — no
  * interpreted Catalyst HOFs, no per-row Catalyst allocation).
  *
  * Input must be `array<double>` (cast upstream); null array → null.
  * Vectors shorter than a centroid compare on the common prefix.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= centroids.length,
    s"n=$n must be in [1, ${centroids.length}]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  def compute(a: ArrayData): ArrayData = {
    val m = centroids.length
    val dists = new Array[Double](m)
    val len = a.numElements()
    var c = 0
    while (c < m) {
      val cc = centroids(c)
      val k = math.min(len, cc.length)
      var s = 0.0
      var i = 0
      while (i < k) {
        val d = a.getDouble(i) - cc(i)
        s += d * d
        i += 1
      }
      dists(c) = s
      c += 1
    }
    // partial selection sort: n is tiny (1..nProbe) vs m cells
    val out = new Array[Int](n)
    val used = new Array[Boolean](m)
    var j = 0
    while (j < n) {
      var best = -1
      var cc = 0
      while (cc < m) {
        if (!used(cc) && (best < 0 || dists(cc) < dists(best))) best = cc
        cc += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  // the case-class equals/hashCode would compare the Array[Array[_]]
  // field by reference, so two semantically identical expressions never
  // compare equal — defeating Catalyst canonicalization, subexpression
  // elimination, and plan-cache hits. Compare contents instead.
  override def equals(other: Any): Boolean = other match {
    case that: NearestCentroids =>
      child == that.child && n == that.n &&
        centroids.length == that.centroids.length &&
        centroids.indices.forall(i =>
          java.util.Arrays.equals(centroids(i), that.centroids(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = java.util.Objects.hash(child, Integer.valueOf(n))
    centroids.foreach(c => h = h * 31 + java.util.Arrays.hashCode(c))
    h
  }
}

object NearestCentroids {
  /** Nearest cell index (argmin) as an int Column. */
  def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(apply(vec, centroids, 1), 1)

  def apply(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ExpressionUtils.column(new NearestCentroids(
      ExpressionUtils.expression(vec.cast("array<double>")), centroids, n))
}
