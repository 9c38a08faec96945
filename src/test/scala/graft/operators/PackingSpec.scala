package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (doc, chunk, tokens): doc ids spread over 2 shards
  private lazy val chunks = Seq(
    (1L, 0, 100L), (1L, 1, 100L), (2L, 0, 50L), (3L, 0, 120L),
    (4L, 0, 90L), (5L, 0, 200L), (6L, 0, 10L), (7L, 0, 130L), (8L, 0, 60L))
    .toDF("doc_id", "chunk_idx", "tokens")

  private def packed = Packing.packChunks(chunks, "tokens",
    Seq("doc_id", "chunk_idx"), pmod(col("doc_id"), lit(2)), budget = 256)

  test("offsets are contiguous within a shard and wrap at the budget") {
    val rows = packed
      .select("doc_id", "chunk_idx", "tokens", "pack_id", "pack_offset")
      .as[(Long, Int, Long, String, Long)].collect()
      .sortBy(r => (r._1 % 2, r._1, r._2))
    rows.groupBy(_._1 % 2).foreach { case (_, shardRows) =>
      var running = 0L
      shardRows.foreach { case (_, _, tokens, packId, offset) =>
        val seq = running / 256
        assert(packId.endsWith(s"-$seq"), s"$packId vs seq $seq")
        assert(offset == running - seq * 256)
        running += tokens
      }
    }
    // every pack starts at offset < budget
    assert(rows.forall(_._5 < 256))
  }

  test("pack ids are disjoint across shards; layout-independent") {
    val ids = packed.select("pack_id").as[String].collect().toSet
    assert(ids.forall(id => id.startsWith("0-") || id.startsWith("1-")))
    val again = Packing.packChunks(chunks.repartition(7), "tokens",
      Seq("doc_id", "chunk_idx"), pmod(col("doc_id"), lit(2)), budget = 256)
      .select("doc_id", "chunk_idx", "pack_id", "pack_offset").collect().toSet
    assert(again == packed.select("doc_id", "chunk_idx", "pack_id", "pack_offset")
      .collect().toSet)
  }
}
