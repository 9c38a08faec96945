package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe table persistence: write to a temp dir, then swap.
  *
  * The reference gets atomicity from one Postgres transaction per entity
  * (run_etl_with_retries.py:60-94). Without a transactional table format
  * we emulate: write `<table>.__tmp`, rename current → `.__old`, rename
  * tmp → live, drop old. A crash mid-swap leaves either the old or the
  * new table plus debris dirs — never a half-written live table. Rename
  * is atomic on HDFS and local FS; on object stores, front with a
  * manifest/catalog pointer instead (documented limitation, SURVEY §7.5).
  */
object AtomicTableWriter {

  def overwrite(df: DataFrame, tablePath: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(tablePath)
    val tmp = new Path(tablePath + ".__tmp")
    val old = new Path(tablePath + ".__old")

    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)

    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)

    if (fs.exists(live) && !fs.rename(live, old))
      throw new java.io.IOException(s"atomic swap: cannot retire $live")
    if (!fs.rename(tmp, live)) {
      // roll back so the live table is never absent
      if (fs.exists(old)) fs.rename(old, live)
      throw new java.io.IOException(s"atomic swap: cannot promote $tmp")
    }
    if (fs.exists(old)) fs.delete(old, true)
  }

  def read(spark: SparkSession, tablePath: String): Option[DataFrame] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(tablePath))) Some(spark.read.parquet(tablePath))
    else None
  }
}
