package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("exportPartitioned: bounded shards, partition dirs, manifest covers all") {
    val root = Files.createTempDirectory("export").toString + "/corpus"
    val df = (1L to 1000L)
      .map(i => (i, if (i % 4 == 0) "val" else "train", s"doc $i"))
      .toDF("doc_id", "split", "text")
      .repartition(2) // few input tasks: shard bound must come from the option
    val (nFiles, totalBytes) = Export.exportPartitioned(df, root,
      Seq("split"), maxRecordsPerFile = 100L)

    val back = spark.read.parquet(root)
    assert(back.count() == 1000)
    assert(back.filter($"split" === "val").count() == 250)

    // every data file respects the record bound
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty && files.size == nFiles)
    files.foreach { f =>
      assert(spark.read.parquet(f.toString).count() <= 100, f.toString)
    }

    // manifest lists exactly the data files, by RELATIVE path (a moved
    // or copied tree must still resolve), with their true sizes
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_manifest.json")), "UTF-8")
    files.foreach { f =>
      val rel = java.nio.file.Paths.get(root).relativize(f).toString
      assert(manifest.contains("\"" + rel + "\""), s"manifest missing relative $rel")
    }
    assert(!manifest.contains(root), "manifest must not embed absolute paths")
    assert(totalBytes == files.map(java.nio.file.Files.size(_)).sum)
    // and the manifest itself is invisible to Spark's listing
    assert(back.columns.toSet == Set("doc_id", "split", "text"))
  }
}
