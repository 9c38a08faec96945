package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table persistence with time travel — the poor-man's
  * lakehouse layer on top of [[AtomicTableWriter]]'s swap idea:
  *
  * {{{
  *   <table>/_versions/v00000042/   immutable parquet snapshot
  *   <table>/_CURRENT               pointer file: "42\n"
  * }}}
  *
  * Every write lands a COMPLETE new snapshot under `_versions/` (tmp
  * dir + atomic rename, so a version dir either fully exists or not at
  * all) and then commits by atomically replacing the `_CURRENT`
  * pointer. Readers resolve the pointer first — a crash mid-write
  * leaves at worst an orphan version dir that no reader resolves, and
  * a crash mid-commit (between pointer delete and rename — the one
  * non-atomic window on filesystems without overwriting rename) is
  * recovered by falling back to the NEWEST fully-landed version, with
  * a warning. Single concurrent writer by contract (the reference was
  * a single-driver pipeline; same as EtlRunLog).
  *
  * Retention keeps the last `keepVersions` snapshots, so recent
  * history stays queryable ([[readVersion]]) for audits, diffs and
  * rollback — storage cost is bounded and old snapshots are dropped
  * only AFTER a successful commit. This is deliberately a pointer
  * commit, not a transaction log: no concurrent writers, no row-level
  * merges — those need a real table format; the value here is crash
  * safety + time travel with nothing but a filesystem.
  */
object VersionedTable {

  private val VersionsDir = "_versions"
  private val Pointer = "_CURRENT"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(table: Path, v: Long) =
    new Path(new Path(table, VersionsDir), f"v$v%08d")

  /** The pointer file's committed version, or None when absent (no
    * recovery fallback — see [[currentVersion]]). */
  private def pointerVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val table = new Path(tablePath)
    val f = fs(spark, table)
    val ptr = new Path(table, Pointer)
    if (!f.exists(ptr)) None
    else {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(f.open(ptr), "UTF-8"))
      try Some(in.readLine().trim.toLong) finally in.close()
    }
  }

  /** Committed current version, resolving the pointer; falls back to
    * the newest landed version (with a warning) if the pointer is
    * missing but versions exist. */
  def currentVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val fromPtr = pointerVersion(spark, tablePath)
    if (fromPtr.isDefined) fromPtr
    else {
      val vs = versions(spark, tablePath)
      if (vs.isEmpty) None
      else {
        System.err.println(
          s"[VersionedTable] $tablePath: pointer missing; recovering to v${vs.max}")
        Some(vs.max)
      }
    }
  }

  /** All landed versions, oldest first (committed or orphaned). */
  def versions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val table = new Path(tablePath)
    val f = fs(spark, table)
    val dir = new Path(table, VersionsDir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d{8}"))
      .map(_.drop(1).toLong)
      .sorted
  }

  /** Write `df` as the next version and commit the pointer; returns
    * the new version number. Old snapshots beyond `keepVersions` are
    * pruned after the commit succeeds. */
  def write(df: DataFrame, tablePath: String, keepVersions: Int = 3,
            partitionBy: Seq[String] = Nil): Long =
    writeChecked(df, tablePath, keepVersions, partitionBy, expected = None)

  private def conflict(tablePath: String, exp: Option[Long],
                       got: Option[Long]): Nothing =
    throw new java.util.ConcurrentModificationException(
      s"versioned write conflict at $tablePath: expected " +
        s"${exp.getOrElse("<absent>")}, found " +
        s"${got.getOrElse("<absent>")} — re-pin and retry")

  private def writeChecked(df: DataFrame, tablePath: String,
                           keepVersions: Int, partitionBy: Seq[String],
                           expected: Option[Option[Long]]): Long = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val spark = df.sparkSession
    val table = new Path(tablePath)
    val f = fs(spark, table)
    val base = currentVersion(spark, tablePath)
    expected.foreach(exp => if (base != exp) conflict(tablePath, exp, base))
    val next = base.getOrElse(0L) + 1L
    val dest = versionDir(table, next)
    val tmp = new Path(dest.toString + ".__tmp")
    if (f.exists(tmp)) f.delete(tmp, true)
    if (f.exists(dest)) f.delete(dest, true) // stale orphan from a crash
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"versioned write: cannot land $dest")
    // re-check as late as possible: the expensive snapshot landing is
    // done; abandon it (orphan, reclaimed by a later write) rather
    // than clobber a concurrent commit. Resolve the POINTER, falling
    // back to the newest landed version EXCLUDING the dir we just
    // landed — our own uncommitted snapshot must not satisfy the check
    expected.foreach { exp =>
      val now = pointerVersion(spark, tablePath)
        .orElse(versions(spark, tablePath).filter(_ != next).maxOption)
      if (now != exp) { f.delete(dest, true); conflict(tablePath, exp, now) }
    }
    commitPointer(f, table, next)
    // retention: drop everything older than the newest keepVersions
    versions(spark, tablePath).dropRight(keepVersions)
      .foreach(v => f.delete(versionDir(table, v), true))
    next
  }

  private def commitPointer(f: org.apache.hadoop.fs.FileSystem,
                            table: Path, v: Long): Unit = {
    val ptr = new Path(table, Pointer)
    val tmp = new Path(table, Pointer + ".__tmp")
    val out = f.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    if (f.exists(ptr)) f.delete(ptr, false)
    if (!f.rename(tmp, ptr))
      throw new java.io.IOException(s"versioned write: cannot commit $ptr")
  }

  /** Compaction (OPTIMIZE): rewrite the CURRENT snapshot into
    * ~`targetBytes`-sized files as a new committed version. Streaming
    * micro-batch appends and fine-grained merges accrete small files,
    * and at 100 TB the scan cost of a table is driven by its file
    * count (task scheduling, footer reads, open/seek overhead) as much
    * as its bytes — compaction is the maintenance pass that restores
    * scan efficiency. Because it rides the versioned-write path it is
    * crash-safe, readers never see a half-compacted table, and the
    * pre-compaction snapshot stays time-travelable until retention
    * drops it. Rows are identical by construction (a repartition, no
    * filter); file ordering within the table is NOT preserved —
    * re-cluster with [[graft.operators.ZOrder.cluster]] before calling
    * if layout matters. Returns the new version, or None for a
    * missing/empty table or when the table already meets the target
    * (no-op — committing a pointless rewrite would churn retention). */
  def compact(spark: SparkSession, tablePath: String,
              targetBytes: Long = 128L << 20, keepVersions: Int = 3,
              partitionBy: Seq[String] = Nil): Option[Long] = {
    require(targetBytes > 0, "targetBytes must be positive")
    currentVersion(spark, tablePath).flatMap { v =>
      val table = new Path(tablePath)
      val f = fs(spark, table)
      val dir = versionDir(table, v)
      val bytes = f.getContentSummary(dir).getLength
      val nFiles = dataFiles(f, dir).size
      val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (nFiles <= want) None // already compact
      else readVersion(spark, tablePath, v).map { df =>
        write(df.repartition(want), tablePath, keepVersions, partitionBy)
      }
    }
  }

  /** Data files (parquet parts) of a landed version — the scan-cost
    * denominator that [[compact]] drives down. */
  def fileCount(spark: SparkSession, tablePath: String, version: Long): Int = {
    val table = new Path(tablePath)
    dataFiles(fs(spark, table), versionDir(table, version)).size
  }

  private def dataFiles(f: org.apache.hadoop.fs.FileSystem,
                        dir: Path): Seq[Path] = {
    val it = f.listFiles(dir, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && name.startsWith("part-") && !name.endsWith(".crc"))
        out += s.getPath
    }
    out.toSeq
  }

  /** The current snapshot, or None for a missing/empty table. */
  def read(spark: SparkSession, tablePath: String): Option[DataFrame] =
    currentVersion(spark, tablePath).flatMap(readVersion(spark, tablePath, _))

  /** A PINNED snapshot: version resolved once at open. */
  case class Snapshot(version: Long, df: DataFrame)

  /** Snapshot-isolation read contract: resolve the pointer ONCE and
    * hand back the version together with its frame. Version dirs are
    * immutable after landing, so every job run against `df` — today or
    * three commits later — reads exactly the rows of `version`:
    * a writer swapping the pointer mid-query never tears a read
    * (the reference got this from Postgres transaction snapshots;
    * here it falls out of immutability + pointer resolution order).
    * The pin is durable only while retention keeps the version: run
    * long audits with `keepVersions` sized to the audit window, or
    * re-pin and diff on [[Snapshot.version]] drift. */
  def pin(spark: SparkSession, tablePath: String): Option[Snapshot] =
    currentVersion(spark, tablePath).flatMap(v =>
      readVersion(spark, tablePath, v).map(Snapshot(v, _)))

  /** Optimistic concurrency write: land + commit ONLY if the current
    * committed version still equals `expected` (None = table must not
    * exist yet). Lost-update protection for the read-modify-write
    * cycle (`pin` → transform → `writeIf(pin.version)`): a concurrent
    * commit in between fails this write loudly instead of silently
    * overwriting it. Best-effort on a plain filesystem — the check
    * re-reads the pointer just before commit, narrowing the race to
    * the pointer-swap window rather than eliminating it (single-writer
    * per table stays the deployment contract; this catches accidental
    * concurrent pipelines, not adversarial ones). */
  def writeIf(df: DataFrame, tablePath: String, expected: Option[Long],
              keepVersions: Int = 3, partitionBy: Seq[String] = Nil): Long =
    writeChecked(df, tablePath, keepVersions, partitionBy, Some(expected))

  /** Time travel: a specific retained snapshot, or None if that
    * version never existed or was pruned. */
  def readVersion(spark: SparkSession, tablePath: String,
                  version: Long): Option[DataFrame] = {
    val table = new Path(tablePath)
    val dir = versionDir(table, version)
    if (fs(spark, table).exists(dir)) Some(spark.read.parquet(dir.toString))
    else None
  }
}
