package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Incremental maintenance for the persistent vector indexes — the
  * vector twin of [[Bm25Index.compact]]'s lifecycle, closing the
  * "build-once, rebuild to update" gap (VERDICT r10 #6):
  *
  *  - [[appendIvfQuantized]] / [[appendSrp]] add NEW vectors to a live
  *    index without touching existing bytes: the delta is assigned
  *    with the index's FROZEN parameters (build-time centroids /
  *    pinned SRP meta — the FAISS discipline: the coarse quantizer
  *    never re-trains on append, else every existing assignment would
  *    be invalidated) and lands as new files inside the existing
  *    `cell=` / `t=,bucket=` partition dirs. Probe correctness is
  *    invariant by construction — probes prune on the same partition
  *    values and rank the union of files in them.
  *  - [[compact]] folds the accumulated per-append files back to ONE
  *    file per partition dir via the [[graft.sources
  *    .AtomicTableWriter]] crash-safe swap. Pure layout change: the
  *    row multiset is untouched, so probe results are byte-identical
  *    before/after (spec-asserted); what improves is probe COST —
  *    footer reads, task scheduling, open/seek all scale with file
  *    count, which otherwise grows per append forever.
  *
  * Contract (same as the BM25 streaming sink): appends are
  * APPEND-ONLY — delta ids must be new. Updating a vector in place
  * means delete+rebuild of its cell (or a full rebuild); parquet has
  * no sub-file delete and silently doubled ids would both rank. The
  * contract is ENFORCED by default ([[requireAppendOnly]]): a
  * duplicate id — within the delta or vs the live index — fails the
  * append loudly before any byte is written; `requireNewIds = false`
  * is the documented off-switch for bulk loads.
  *
  * PQ completes the family without needing its own maintenance: its
  * codebooks are driver-side literals (compiled into the ADC kernels,
  * [[Pq.Codebooks]]) and its IVF×PQ form rides on THIS IVF index's
  * layout, so "maintain the PQ index" reduces to maintaining the IVF
  * data tree + re-encoding appended rows with the frozen codebooks.
  *
  * 100 TB shape: an append touches only the delta (one zero-shuffle
  * assignment projection + one `cell`-keyed exchange so each touched
  * dir gains ONE file, not one per task); compact is a full rewrite —
  * schedule it like BM25 compaction, after every N appends, not per
  * append.
  */
object VectorIndexOps {

  /** Enforces the append-only contract: fails loudly when the delta
    * repeats an id internally or carries one already in the index —
    * a silent violation would let both rows rank in probes. Costs one
    * column-pruned scan of the index's id column per guarded append;
    * callers that own id discipline (bulk loads) pass
    * `requireNewIds = false` to skip it. */
  private def requireAppendOnly(ids: DataFrame, indexPath: String): Unit = {
    val spark = ids.sparkSession
    val dupes = ids.groupBy(col("neighbor_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(5).collect()
    require(dupes.isEmpty, s"append-only contract violated: delta repeats " +
      s"id(s) ${dupes.map(_.get(0)).mkString(", ")} … — duplicated ids would " +
      "both rank in probes; dedup the delta or pass requireNewIds = false")
    val dataPath = new Path(s"$indexPath/data")
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dataPath)) {
      val clash = ids.join(spark.read.parquet(dataPath.toString)
          .select(col("neighbor_id")), Seq("neighbor_id"), "left_semi")
        .limit(5).collect()
      require(clash.isEmpty, s"append-only contract violated: id(s) " +
        s"${clash.map(_.get(0)).mkString(", ")} … already in $indexPath — " +
        "updates need delete+rebuild of the cell (see scaladoc); " +
        "pass requireNewIds = false only if the caller owns id discipline")
    }
  }

  /** Append `delta` to a [[Similarity.buildIvfIndexQuantized]] index:
    * rows are quantized and assigned against the INDEX's centroids
    * (read from `centroids/` — never re-fitted), then appended
    * one-file-per-touched-cell. EAGER: runs the write now.
    *
    * @param requireNewIds verify the append-only contract (default on;
    *                      see [[requireAppendOnly]])
    * @return number of rows appended */
  def appendIvfQuantized(delta: DataFrame, idCol: String, vecCol: String,
                         indexPath: String, requireNewIds: Boolean = true): Long = {
    val spark = delta.sparkSession
    val qCentroids = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cell").select("centroid")
      .collect().map(_.getSeq[Long](0).map(_.toDouble).toArray)
    require(qCentroids.nonEmpty, s"no centroids at $indexPath — not an IVF index")
    val assigned = Similarity.assignCells(
      delta.repartition(spark.sparkContext.defaultParallelism)
        .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv")),
      "cv", qCentroids)
      .transform(Materialize.once) // counted + written (+ guarded)
    if (requireNewIds) requireAppendOnly(assigned.select("neighbor_id"), indexPath)
    val n = assigned.count()
    assigned
      .repartition(col("cell")) // one new file per touched cell dir
      .write.mode("append").partitionBy("cell").parquet(s"$indexPath/data")
    n
  }

  /** Append `delta` to a [[Similarity.buildSrpIndex]] index: bucket
    * keys come from the index's pinned `meta/` (planes, tables, dims) —
    * the same lockstep rule as probing. EAGER.
    *
    * @param requireNewIds verify the append-only contract (default on;
    *                      see [[requireAppendOnly]])
    * @return number of rows appended (before the ×tables fan-out) */
  def appendSrp(delta: DataFrame, idCol: String, vecCol: String,
                indexPath: String, requireNewIds: Boolean = true): Long = {
    val spark = delta.sparkSession
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (planes, tables, dims) =
      (meta.getAs[Int]("planes"), meta.getAs[Int]("tables"), meta.getAs[Int]("dims"))
    val rows = delta.repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
      .transform(Materialize.once) // counted + written (+ guarded)
    if (requireNewIds) requireAppendOnly(rows.select("neighbor_id"), indexPath)
    val n = rows.count()
    rows
      .select(col("neighbor_id"), col("cv"),
        posexplode(Similarity.srpBucketsAll(col("cv"), planes, tables, dims))
          .as(Seq("t", "bucket")))
      .repartition(col("t"), col("bucket")) // one new file per touched dir
      .write.mode("append").partitionBy("t", "bucket").parquet(s"$indexPath/data")
    n
  }

  /** Fold a maintained index's `data/` tree to one file per partition
    * dir (crash-safe swap; readers see old or new, never a mix). The
    * partition layout is discovered from the tree itself (`cell=` for
    * IVF, `t=`/`bucket=` for SRP), so one compactor serves both
    * families.
    *
    * @return Some(dataFilesBefore) when a rewrite happened; None when
    *         the index is absent or already one-file-per-dir (no-op —
    *         pointless rewrites churn I/O) */
  def compact(spark: SparkSession, indexPath: String): Option[Long] = {
    val dataPath = new Path(s"$indexPath/data")
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dataPath)) return None
    // leaf partition dirs -> parquet file counts (local metadata walk;
    // proportional to partition count, not data size)
    def walk(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).toSeq
      val dirs = entries.filter(s => s.isDirectory &&
        s.getPath.getName.contains("="))
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(s => walk(s.getPath))
    }
    val leaves = walk(dataPath)
    val counts = leaves.map(l => fs.listStatus(l)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
    if (counts.forall(_ <= 1)) return None
    val df = spark.read.parquet(dataPath.toString)
    val partCols = Seq("t", "bucket", "cell").filter(df.columns.contains)
    require(partCols.nonEmpty,
      s"$indexPath/data has no recognized partition layout (cell | t,bucket)")
    graft.sources.AtomicTableWriter.overwrite(
      df.repartition(partCols.map(col): _*), dataPath.toString,
      partitionBy = partCols)
    Some(counts.map(_.toLong).sum)
  }
}
