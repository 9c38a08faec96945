package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping: a tiny per-file statistics table
  * (`<path>/_stats`) written next to a parquet table, and a reader
  * that consults it to open ONLY the files whose [min, max] envelope
  * can contain a range predicate's matches.
  *
  * This is the layout half of the scan-pruning story that partition
  * pruning can't cover: partitioning handles ONE coarse key;
  * file-level envelopes handle any clustered column, and combined
  * with a Z-order write ([[graft.operators.ZOrder.cluster]]) they
  * prune on SEVERAL columns at once. At 100 TB with ~100k files the
  * stats table is ~100k rows — a driver-side filter — while the
  * pruned scan skips the bytes that dominate the query's cost. The
  * same idea backs Delta/Iceberg file statistics and parquet
  * row-group min/max, but here the envelope is consulted BEFORE any
  * footer is opened, so a selective query on a well-clustered table
  * never even lists the skipped files' metadata.
  *
  * Correctness does not depend on the pruning: [[prunedRead]] always
  * re-applies the full predicate to the rows it reads, so the stats
  * can only skip files, never fabricate matches. The stats describe
  * the files present at [[writeWithStats]] time — this is a
  * write-once table format (rewrite the table to change it), matching
  * [[AtomicTableWriter]]'s swap discipline for updates.
  *
  * A range whose column has only NULLs in a file skips that file:
  * NULL never satisfies a range predicate, and parquet min/max for an
  * all-null file is NULL, which fails the overlap test — conservative
  * in exactly the right direction.
  */
object DataSkipping {

  /** Inclusive range predicate on one column: keep files where
    * [min, max] intersects [lo, hi]. */
  final case class ColRange(name: String, lo: Column, hi: Column)

  /** Write `df` as parquet at `path` plus a `_stats` side table with
    * per-file (count, min, max) for each of `statsCols`. One data file
    * per partition of `df` — cluster first (repartitionByRange or
    * ZOrder.cluster) so the envelopes are tight; stats on a randomly
    * laid-out table are valid but skip nothing. The `_stats` directory
    * is underscore-prefixed, so plain `spark.read.parquet(path)`
    * ignores it — the table stays readable by any parquet consumer. */
  def writeWithStats(df: DataFrame, path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "need at least one stats column")
    df.write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val aggs = count(lit(1)).as("cnt") +:
      statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/_stats")
  }

  /** The per-file statistics table (one row per data file). */
  def stats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_stats")

  /** Append a batch to a [[writeWithStats]] table, computing envelopes
    * for the NEW files only — the incremental-ingest path. The old
    * stats rows are reused untouched (at 100 TB, re-profiling the
    * whole table per micro-batch would dwarf the batch itself); only
    * the appended files are opened. The refreshed stats land via
    * tmp-dir + atomic rename, so a reader never sees a half-written
    * stats table; a crash between the data append and the stats swap
    * leaves the new files invisible to [[prunedRead]] (which reads the
    * file list from the stats) — re-run the append's stats step, never
    * a wrong answer. `statsCols` must match the original write. */
  def appendWithStats(df: DataFrame, path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "need at least one stats column")
    val spark = df.sparkSession
    val before = stats(spark, path).collect() // one row per file: tiny
    // compare by basename: part- names are UUID-unique, and the URI
    // rendering of _metadata.file_path and a Hadoop listing differ
    val known = before.map(r => basename(r.getAs[String]("file"))).toSet
    df.write.mode("append").parquet(path)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newFiles = fs.listStatus(hp).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && !p.getName.endsWith(".crc"))
      .filterNot(p => known.contains(p.getName))
      .map(_.toUri.toString)
    if (newFiles.isEmpty) return // empty batch: nothing to profile
    val aggs = count(lit(1)).as("cnt") +:
      statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val fresh = spark.read.parquet(newFiles: _*) // ONLY the new bytes
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(before.toSeq), stats(spark, path).schema))
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/_stats")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_stats.__tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    fresh.repartition(1).write.parquet(tmp.toString)
    fs.delete(statsDir, true)
    if (!fs.rename(tmp, statsDir))
      throw new java.io.IOException(s"cannot commit refreshed stats at $statsDir")
  }

  private def basename(uri: String): String =
    uri.substring(uri.lastIndexOf('/') + 1)

  /** Driver-side file pruning: the data files whose envelope overlaps
    * EVERY range. Missing stats columns are an error; a file is kept
    * iff `max_c >= lo AND min_c <= hi` for all ranges (NULL envelope →
    * dropped, see class doc). Returns (selected, total) file lists so
    * callers — and tests — can see the skip rate. */
  def pruneFiles(spark: SparkSession, path: String,
                 ranges: Seq[ColRange]): (Seq[String], Int) = {
    val st = stats(spark, path)
    ranges.foreach { r =>
      require(st.columns.contains(s"min_${r.name}"),
        s"no stats for column ${r.name} at $path (have: ${st.columns.mkString(",")})")
    }
    val keep = ranges.map(r =>
        col(s"max_${r.name}") >= r.lo && col(s"min_${r.name}") <= r.hi)
      .reduce(_ && _)
    val total = st.count().toInt // stats table: one small file, driver-cheap
    val selected = st.filter(keep).select("file").collect().map(_.getString(0)).toSeq
    (selected, total)
  }

  /** Read the table through the stats: open only the overlapping
    * files, then re-apply the exact range predicate (pruning is an
    * optimization, never the filter). Zero matching files short-
    * circuits to an empty DataFrame with the table schema — no scan,
    * no footer reads. */
  def prunedRead(spark: SparkSession, path: String,
                 ranges: Seq[ColRange]): DataFrame = {
    val (files, _) = pruneFiles(spark, path, ranges)
    val residual = ranges.map(r => col(r.name) >= r.lo && col(r.name) <= r.hi)
      .reduce(_ && _)
    if (files.isEmpty) {
      val schema = spark.read.parquet(path).schema // footer-only
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else spark.read.parquet(files: _*).filter(residual)
  }
}
