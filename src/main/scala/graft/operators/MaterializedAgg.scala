package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized aggregate: fold a new
  * batch of facts into an existing rollup WITHOUT rescanning the
  * history.
  *
  * The reference recomputes its reporting aggregates from the full
  * fact table on every run (fine at Postgres scale); at 100 TB the
  * daily batch is ~0.1% of the table and a full re-aggregation is a
  * 1000× overread. For re-aggregatable functions (sum, count, min,
  * max — anything forming a commutative monoid on the partial state)
  * the maintained rollup is exact:
  * `agg(history ∪ batch) = combine(agg(history), agg(batch))`.
  * Averages are carried as (sum, count) pairs and finalized at read.
  *
  * Scale shape: aggregate the BATCH (small), union with the existing
  * state (keyed rows, already aggregate-sized), re-reduce on the key.
  * The shuffle moves `O(state + batch)` rows, never the fact history.
  * With the state table bucketed on the key (PartitionedMerge), even
  * the state side joins without a shuffle.
  */
object MaterializedAgg {

  /** One maintenance step.
    *
    * @param state existing rollup: `keys ++ aggregate columns` — must
    *              have exactly the schema this function produces, so
    *              steps compose (`maintain(maintain(s, b1), b2)`)
    * @param batch new raw fact rows
    * @param keys  grouping key columns
    * @param aggs  (name, raw-batch aggregate, state re-reducer); e.g.
    *              `("revenue", sum("price"), sum("revenue"))` — the
    *              second aggregates raw rows, the third re-reduces
    *              already-aggregated state rows
    */
  def maintain(state: DataFrame, batch: DataFrame, keys: Seq[String],
               aggs: Seq[(String, Column, Column)]): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "need keys and aggregates")
    val batchAgg = batch.groupBy(keys.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, a, _) => a.as(n) }: _*)
    state.select((keys ++ aggs.map(_._1)).map(col): _*)
      .unionByName(batchAgg.select((keys ++ aggs.map(_._1)).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._3.as(aggs.head._1),
        aggs.tail.map { case (n, _, r) => r.as(n) }: _*)
  }
}
