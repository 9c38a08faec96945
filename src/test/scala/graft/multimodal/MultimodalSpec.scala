package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = (0 until 20)
    .map(i => (i.toLong, s"media-blob-content-$i".getBytes("UTF-8")))
    .toDF("id", "content")

  test("withMetadata: deterministic stub meta, stable across runs") {
    val rows = Multimodal.withMetadata(media, "id", "content")
    val m1 = rows.collect().map(r => r.id -> r.meta).toMap
    val m2 = Multimodal.withMetadata(media, "id", "content")
      .collect().map(r => r.id -> r.meta).toMap
    assert(m1 == m2) // pure function of content
    assert(m1.values.forall(m => m.width >= 0 && m.width < 1280))
    assert(m1.values.forall(m => m.height >= 0 && m.height < 720))
  }

  test("extractFeatures: fixed-dim embeddings feed Similarity ops") {
    val rows = Multimodal.withMetadata(media, "id", "content")
    val feats = Multimodal.extractFeatures(rows, dim = 16)
    val collected = feats.collect()
    assert(collected.length == 20)
    assert(collected.forall(_.embedding.length == 16))
    assert(collected.forall(_.frames >= 1))
    // embeddings are usable by the similarity operators
    val df = feats.toDF().select($"id", $"embedding")
    val knn = graft.operators.Similarity.bruteForceTopK(
      df.filter($"id" < 2), df, "id", "embedding", k = 3)
    assert(knn.count() == 6)
  }

  test("resizeAll: deterministic stub thumbnails sized to the target") {
    val rows = Multimodal.withMetadata(media, "id", "content")
    val small = Multimodal.resizeAll(rows, 64, 64).collect().toMap
    val large = Multimodal.resizeAll(rows, 256, 256).collect().toMap
    assert(small.keySet == (0L until 20L).toSet)
    assert(small.values.forall(_.length == 64 * 64 / 64))
    assert(large.values.forall(_.length == 256 * 256 / 64))
    // pure function of (content, target): rerun is byte-identical
    val again = Multimodal.resizeAll(rows, 64, 64).collect().toMap
    assert(small.keys.forall(k => small(k).sameElements(again(k))))
  }

  test("repartitionBySize balances partitions and preserves rows") {
    val out = Multimodal.repartitionBySize(media, "content",
      targetBytes = 64, partitions = 4)
    assert(out.count() == 20)
    assert(out.columns.toSeq == Seq("id", "content"))
    assert(out.rdd.getNumPartitions == 4)
  }
}
