package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Training-data export layout: the write side of a curation pipeline.
  *
  * Writes the corpus partitioned by the given columns (e.g. lang,
  * split) with a bounded record count per file — downstream training
  * loaders want many same-sized shards, not one giant file per
  * partition — plus a `_manifest.json` sidecar listing every data file
  * with its byte size, so consumers can plan reads (or detect a
  * partial copy) without listing the tree. The underscore prefix keeps
  * the manifest invisible to Spark's own file listing.
  *
  * 100 TB note: `maxRecordsPerFile` bounds file size at write time
  * without an extra repartition job; pair with a `repartition(n,
  * partitionCols)` upstream when the input's layout would otherwise
  * create one tiny file per task per partition value.
  */
object Export {

  /** Write + manifest; returns (file count, total bytes). */
  def exportPartitioned(df: DataFrame, path: String,
                        partitionCols: Seq[String],
                        maxRecordsPerFile: Long = 1000000L): (Int, Long) = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    writeManifest(df, path)
  }

  private def writeManifest(df: DataFrame, path: String): (Int, Long) = {
    val root = new Path(path)
    val fs = root.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    // qualify the root first: listFiles returns scheme-qualified paths
    // (file:/..., hdfs://...), and URI.relativize against an
    // unqualified root is a silent no-op that would record ABSOLUTE
    // paths — breaking the move-the-tree / partial-copy contract
    val qualifiedRoot = fs.makeQualified(root).toUri
    val files = {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        val rel = qualifiedRoot.relativize(f.getPath.toUri).getPath
        if (rel.endsWith(".parquet")) buf += rel -> f.getLen
      }
      buf.sortBy(_._1)
    }
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    val json = files.map { case (p, len) =>
      s"""{"path": "${esc(p)}", "bytes": $len}"""
    }.mkString("[\n", ",\n", "\n]")
    val out = fs.create(new Path(root, "_manifest.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    (files.size, files.map(_._2).sum)
  }
}
