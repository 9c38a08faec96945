package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned merge: the 100 TB shape of W1/W2 (SURVEY §7.6).
  *
  * A whole-table `staged ∪ (target ⟕anti staged)` rewrite reads and
  * rewrites 100 TB to merge a 100 GB batch. When the target is
  * partitioned by a column the staged batch also carries (date, tenant,
  * hash bucket), only partitions containing staged keys need to change:
  *
  *   1. collect the staged batch's distinct partition values (small —
  *      one shuffle of the batch, a driver list of partition names)
  *   2. read ONLY those partitions of the target (partition pruning —
  *      no full scan)
  *   3. merge within them
  *   4. write back with `partitionOverwriteMode=dynamic`, which
  *      replaces exactly the touched partitions atomically and leaves
  *      every other partition's files untouched
  *
  * Cost scales with the affected-partition volume, not table volume.
  * For keys with no natural partition column, write the table
  * partitioned by `pmod(hash(key), nBuckets)` ([[bucketOf]]) — staged
  * batches then prune to the buckets their keys hash into.
  */
object PartitionedMerge {

  def bucketOf(keyCol: String, nBuckets: Int) =
    pmod(hash(col(keyCol)), lit(nBuckets)).as("bucket")

  /** Upsert `staged` into the partitioned table at `targetPath`.
    * `partCol` must exist in staged with target-compatible values.
    * Creates the table if absent. Returns the touched partition values. */
  def upsert(spark: SparkSession, targetPath: String, staged: DataFrame,
             keys: Seq[String], partCol: String): Seq[String] = {
    val fs = new Path(targetPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(targetPath))) {
      staged.write.partitionBy(partCol).mode("overwrite").parquet(targetPath)
      return staged.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }
    val parts = staged.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val target = spark.read.parquet(targetPath)
      // partition-pruned scan: only directories for touched values are read
      .filter(col(partCol).cast("string").isin(parts: _*))
    val merged = MergeOps.upsert(target.select(staged.columns.map(col): _*), staged, keys)
    withDynamicOverwrite(spark) {
      merged.write.mode("overwrite").partitionBy(partCol)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(targetPath)
    }
    parts
  }

  /** Delete-matched + reload (W2) with the same pruning. */
  def deleteReload(spark: SparkSession, targetPath: String, stagedRows: DataFrame,
                   keys: Seq[String], partCol: String): Seq[String] = {
    val fs = new Path(targetPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(targetPath))) {
      stagedRows.write.partitionBy(partCol).mode("overwrite").parquet(targetPath)
      return stagedRows.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }
    val parts = stagedRows.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val target = spark.read.parquet(targetPath)
      .filter(col(partCol).cast("string").isin(parts: _*))
    val merged = MergeOps.deleteReload(
      target.select(stagedRows.columns.map(col): _*),
      stagedRows, stagedRows.select(keys.map(col): _*), keys)
    withDynamicOverwrite(spark) {
      merged.write.mode("overwrite").partitionBy(partCol)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(targetPath)
    }
    parts
  }

  private def withDynamicOverwrite[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try f finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
