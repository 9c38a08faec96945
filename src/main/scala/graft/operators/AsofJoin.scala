package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single latest right row with
  * `rightTs <= leftTs` on the same key (time-series point-in-time
  * lookup). Spark has no native operator for this; the naive
  * formulation (non-equi join + per-left-row max) re-shuffles and
  * explodes on hot keys.
  *
  * Implemented as the scalable union-and-carry-forward composition:
  * union both sides tagged, sort within each key by (ts, side) — right
  * rows before left rows at equal ts, giving `<=` semantics — and
  * carry the last non-null right values forward with a running
  * `last(ignoreNulls)` window. ONE shuffle on the key, linear scan per
  * partition, no pair explosion: the plan a native as-of operator
  * would produce.
  *
  * Ref for semantics: DuckDB `ASOF LEFT JOIN` (the oracle in
  * EtlQueries.q46) and kdb+ `aj`.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry onto left rows
    * (null when no right row precedes the left row). */
  def leftAsof(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__r_$c"))): _*)
    // right rows sort before left rows at equal ts → `<=` match
    // semantics; the ORDERABLE carried value columns complete the order
    // so that several right rows sharing (key, ts) always resolve to
    // the same survivor (the greatest by value tuple) on any partition
    // layout. Unorderable types (maps) are skipped — sorting on them
    // would throw; ties on such columns alone stay layout-dependent.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _ => true
    }
    val tieBreak = valueCols.filter(c => orderable(right.schema(c).dataType))
      .map(c => col(s"__r_$c"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts") +: col("__side") +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("*") +:
        valueCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w)
          .as(s"__c_$c")): _*)
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__c_$c").as(s"asof_$c"))): _*)
  }
}
