package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared maintenance for streaming-fed persistent indexes (the BM25
  * postings store, the CDC chunk store): each micro-batch fold lands
  * one `postings/__batch=<id>/bucket=N/` partition tree, so file
  * count — and with it probe cost: footer reads, task scheduling,
  * open/seek — grows per batch FOREVER. Compaction rewrites every
  * batch layer into ONE `__batch=<last>` layer, one file per touched
  * bucket, via the [[AtomicTableWriter]] crash-safe swap (readers
  * never see a half-compacted index; a crash leaves old or new, never
  * a mix).
  *
  * Row multisets are unchanged by construction — ids are append-only
  * across batches (the sink contract) — so probe results are
  * BYTE-identical before and after; only the file layout moves.
  */
object IndexMaintenance {

  /** Fold all `__batch=` layers of a bucket-partitioned postings tree
    * into one. @return layers folded, or None when the tree is absent,
    * batch-built (no `__batch` level), or already a single layer
    * (no-op — pointless rewrites churn I/O). */
  def compactBatchLayers(spark: SparkSession,
                         postingsPath: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(postingsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val postings = spark.read.parquet(postingsPath)
    if (!postings.columns.contains("__batch")) return None
    val layers = postings.select(col("__batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (layers.length <= 1) return None
    // one task per bucket value -> one file per bucket dir; __batch
    // collapses to the newest id so a later fold's replay guard
    // comparison semantics are unchanged
    val consolidated = postings.drop("__batch")
      .withColumn("__batch", lit(layers.last))
      .repartition(col("bucket"))
    AtomicTableWriter.overwrite(
      consolidated, postingsPath, partitionBy = Seq("__batch", "bucket"))
    Some(layers.length.toLong)
  }
}
