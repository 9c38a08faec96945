package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class VectorIndexOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus: 40 vectors in 8 dims, clustered-ish. */
  private def corpus(ids: Range): DataFrame =
    ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        ((i % 5) * 10 + d + (i * 7 % 3)).toFloat / 10f))
    }.toDF("vec_id", "vec")

  private def queries: DataFrame =
    Seq((1000L, Array.tabulate(8)(d => (d + 1).toFloat / 10f)),
      (1001L, Array.tabulate(8)(d => (30 + d).toFloat / 10f)))
      .toDF("vec_id", "vec")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def probeRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dataFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(s"$path/data"))
  }

  test("IVF: N appends + compact ≡ fresh build with the same frozen quantizer") {
    val full = corpus(0 until 40)
    // freeze ONE quantizer, trained on the full corpus, shared by both
    // builds — the discipline appendIvfQuantized's scaladoc pins
    val cents = Similarity.fitQuantizedCentroids(full, "vec", nCells = 4)
    val freshPath = tmp("ivf-fresh")
    val incrPath = tmp("ivf-incr")
    Similarity.buildIvfIndexQuantized(full, "vec_id", "vec", freshPath,
      nCells = 4, preFitted = Some(cents))
    Similarity.buildIvfIndexQuantized(corpus(0 until 20), "vec_id", "vec",
      incrPath, nCells = 4, preFitted = Some(cents))
    assert(VectorIndexOps.appendIvfQuantized(
      corpus(20 until 30), "vec_id", "vec", incrPath) == 10L)
    assert(VectorIndexOps.appendIvfQuantized(
      corpus(30 until 40), "vec_id", "vec", incrPath) == 10L)
    val expected = probeRows(
      Similarity.ivfProbeQuantized(queries, freshPath, "vec_id", "vec",
        k = 5, nProbe = 2))
    // appends alone already serve identical probes...
    assert(probeRows(Similarity.ivfProbeQuantized(queries, incrPath,
      "vec_id", "vec", k = 5, nProbe = 2)) == expected)
    // ...and compaction is a pure layout change: byte-identical after
    val before = dataFiles(incrPath).size
    val folded = VectorIndexOps.compact(spark, incrPath)
    assert(folded.contains(before.toLong))
    assert(probeRows(Similarity.ivfProbeQuantized(queries, incrPath,
      "vec_id", "vec", k = 5, nProbe = 2)) == expected)
    // one file per cell dir afterwards
    val perDir = dataFiles(incrPath).groupBy(_.getParentFile).values.map(_.size)
    assert(perDir.nonEmpty && perDir.forall(_ == 1))
    // second compact is a no-op (already one file per dir)
    assert(VectorIndexOps.compact(spark, incrPath).isEmpty)
  }

  test("SRP: build(prefix) + append(rest) + compact ≡ fresh full build") {
    // SRP needs no trained quantizer, so fresh-vs-incremental is exact
    // with zero injection: the hyperplanes are pinned by (planes, seed)
    val freshPath = tmp("srp-fresh")
    val incrPath = tmp("srp-incr")
    Similarity.buildSrpIndex(corpus(0 until 40), "vec_id", "vec", freshPath,
      planes = 4, tables = 2, dims = 8)
    Similarity.buildSrpIndex(corpus(0 until 25), "vec_id", "vec", incrPath,
      planes = 4, tables = 2, dims = 8)
    assert(VectorIndexOps.appendSrp(
      corpus(25 until 40), "vec_id", "vec", incrPath) == 15L)
    val expected = probeRows(
      Similarity.srpProbe(queries, freshPath, "vec_id", "vec", k = 5))
    assert(probeRows(Similarity.srpProbe(queries, incrPath,
      "vec_id", "vec", k = 5)) == expected)
    VectorIndexOps.compact(spark, incrPath)
    assert(probeRows(Similarity.srpProbe(queries, incrPath,
      "vec_id", "vec", k = 5)) == expected)
    val perDir = dataFiles(incrPath).groupBy(_.getParentFile).values.map(_.size)
    assert(perDir.nonEmpty && perDir.forall(_ == 1))
  }

  test("compact: absent index is None, not an error") {
    assert(VectorIndexOps.compact(spark, tmp("no-index") + "/nope").isEmpty)
  }

  test("append-only contract: a duplicate-id append fails loudly, not silently") {
    val cents = Similarity.fitQuantizedCentroids(corpus(0 until 20), "vec", nCells = 4)
    val ivfPath = tmp("ivf-guard")
    Similarity.buildIvfIndexQuantized(corpus(0 until 20), "vec_id", "vec",
      ivfPath, nCells = 4, preFitted = Some(cents))
    // id 10 is already in the index → loud failure, nothing written
    val before = dataFiles(ivfPath).size
    val e1 = intercept[IllegalArgumentException] {
      VectorIndexOps.appendIvfQuantized(
        corpus(10 until 25), "vec_id", "vec", ivfPath)
    }
    assert(e1.getMessage.contains("append-only"))
    assert(dataFiles(ivfPath).size == before, "failed append must not write")
    // a delta that repeats an id internally fails too
    val dupDelta = corpus(20 until 25).unionByName(corpus(22 until 23))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndexOps.appendIvfQuantized(dupDelta, "vec_id", "vec", ivfPath)
    }
    assert(e2.getMessage.contains("append-only"))
    // documented off-switch: caller owns id discipline
    assert(VectorIndexOps.appendIvfQuantized(corpus(10 until 25), "vec_id",
      "vec", ivfPath, requireNewIds = false) == 15L)
    // same guard on the SRP family
    val srpPath = tmp("srp-guard")
    Similarity.buildSrpIndex(corpus(0 until 20), "vec_id", "vec", srpPath,
      planes = 4, tables = 2, dims = 8)
    val e3 = intercept[IllegalArgumentException] {
      VectorIndexOps.appendSrp(corpus(15 until 30), "vec_id", "vec", srpPath)
    }
    assert(e3.getMessage.contains("append-only"))
    // and a clean append still passes the guard
    assert(VectorIndexOps.appendSrp(
      corpus(20 until 30), "vec_id", "vec", srpPath) == 10L)
  }
}
