package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The merge engine (SURVEY §2.8 W1–W7): upsert / full-refresh /
  * delete-reload / snapshot-append re-expressed as DataFrame
  * composition. No Delta/Iceberg jars are present, so MERGE is emulated
  * as `staged ∪ (target ⟕anti staged)` and persisted via
  * `AtomicTableWriter` (write-temp + atomic swap ≈ the reference's
  * per-entity Postgres transaction, run_etl_with_retries.py:60-94).
  *
  * Scale notes (100 TB): the anti-join shuffles target by the merge key
  * once — on a partitioned target, pair with
  * `partitionOverwriteMode=dynamic` so only partitions containing
  * staged keys rewrite (SURVEY §7.6). Staged batches are typically tiny
  * relative to target → Spark broadcasts the staged key set
  * automatically under AQE.
  */
object MergeOps {

  /** A5 — keep-latest-per-key (`DISTINCT ON` semantics,
    * run_logs.txt:346-361). `order` must be a TOTAL order: Postgres
    * `DISTINCT ON` with ties is nondeterministic; we fix the tie-break
    * explicitly (SURVEY §7.3). */
  def dedupLatest(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** W1/W6-style upsert (`INSERT ... ON CONFLICT (k) DO UPDATE`,
    * run_logs.txt:510-536): staged rows win; unmatched target rows
    * survive. Staged must be unique per key (pre-dedup with
    * [[dedupLatest]] if not). Idempotent: re-running with the same
    * staged batch yields the same table — the property the reference's
    * overlap-lookback rescan depends on (daily_scheduler.py:75-81). */
  def upsert(target: DataFrame, staged: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    staged.unionByName(
      target.join(staged.select(keyCols: _*).distinct(), keys, "left_anti"))
  }

  /** W2 — delete-matched + reload (`DELETE WHERE order_id IN (staged)`
    * then reinsert, run_logs.txt:545-573). `stagedKeys` carries the key
    * column(s) only. */
  def deleteReload(target: DataFrame, stagedRows: DataFrame, stagedKeys: DataFrame,
                   keys: Seq[String]): DataFrame =
    target.join(stagedKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(stagedRows)

  /** W3–W5 — full refresh (`TRUNCATE` + insert): trivially the staged
    * frame; kept for a uniform job registry. */
  def fullRefresh(staged: DataFrame): DataFrame = staged

  /** W7 — idempotent snapshot append: upsert on (keys..., snapshot key)
    * so a same-day re-run overwrites rather than duplicates
    * (run_logs.txt:455-461). On a date-partitioned table this is a
    * dynamic partition overwrite of today's partition only. */
  def snapshotAppend(snapshots: DataFrame, todays: DataFrame, keys: Seq[String]): DataFrame =
    upsert(snapshots, todays, keys)

  /** U1 — two-store federation: union staged frames per store; degenerate
    * single-side case allowed (run_etl_with_retries.py:41-44). */
  def combineStores(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_))
}
