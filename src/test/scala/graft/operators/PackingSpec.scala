package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (doc, chunk, tokens): doc ids spread over 2 shards; sizes chosen so
  // several chunks straddle the 256-token pack cuts
  private lazy val chunks = Seq(
    (1L, 0, 100L), (1L, 1, 100L), (2L, 0, 50L), (3L, 0, 120L),
    (4L, 0, 90L), (5L, 0, 200L), (6L, 0, 10L), (7L, 0, 130L), (8L, 0, 60L))
    .toDF("doc_id", "chunk_idx", "tokens")

  private def packed = Packing.packChunks(chunks, "tokens",
    Seq("doc_id", "chunk_idx"), pmod(col("doc_id"), lit(2)), budget = 256)

  test("every pack holds exactly the budget (shard-final packs shorter)") {
    val perPack = packed.groupBy("pack_id")
      .agg(sum("span_tokens").as("total")).as[(String, Long)].collect().toMap
    val lastPerShard = perPack.keys.groupBy(_.split("-")(0))
      .map { case (sh, ids) => ids.maxBy(_.split("-")(1).toInt) }.toSet
    perPack.foreach { case (id, total) =>
      if (lastPerShard(id)) assert(total <= 256, s"$id overflows: $total")
      else assert(total == 256, s"$id must be full: $total")
    }
    // offsets live inside the pack
    assert(packed.filter($"pack_offset" < 0 || $"pack_offset" >= 256).count() == 0)
  }

  test("spans of a chunk are contiguous and cover it exactly") {
    val byChunk = packed
      .select("doc_id", "chunk_idx", "tokens", "span_start", "span_tokens")
      .as[(Long, Int, Long, Long, Long)].collect()
      .groupBy(t => (t._1, t._2))
    byChunk.foreach { case ((doc, ci), spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"($doc,$ci) first span must start at 0")
      assert(sorted.map(_._5).sum == sorted.head._3, s"($doc,$ci) spans must cover")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._5, s"($doc,$ci) gap")
        case _ => ()
      }
    }
    // straddling happened (otherwise this spec tests nothing)
    assert(byChunk.exists(_._2.size > 1))
  }

  test("pack ids are disjoint across shards; layout-independent; no zero chunks") {
    val ids = packed.select("pack_id").as[String].collect().toSet
    assert(ids.forall(id => id.startsWith("0-") || id.startsWith("1-")))
    val again = Packing.packChunks(chunks.repartition(7), "tokens",
      Seq("doc_id", "chunk_idx"), pmod(col("doc_id"), lit(2)), budget = 256)
      .select("doc_id", "chunk_idx", "pack_id", "pack_offset", "span_tokens")
      .collect().toSet
    assert(again == packed.select("doc_id", "chunk_idx", "pack_id", "pack_offset",
      "span_tokens").collect().toSet)
    // zero-token chunks are dropped, not exploded into bogus spans
    val withZero = chunks.unionByName(Seq((9L, 0, 0L)).toDF("doc_id", "chunk_idx", "tokens"))
    val z = Packing.packChunks(withZero, "tokens",
      Seq("doc_id", "chunk_idx"), pmod(col("doc_id"), lit(2)), budget = 256)
    assert(z.filter($"doc_id" === 9L).count() == 0)
  }
}
