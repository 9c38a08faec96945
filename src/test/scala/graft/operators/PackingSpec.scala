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

  test("packIdSequences: shard streams reconstruct exactly; packs are full") {
    // id arrays with distinct values so reconstruction is checkable
    val docs = (1L to 9L).map { d =>
      (d, (0 until (d * 7 % 23 + 3).toInt).map(i => (d * 100 + i).toInt))
    }.toDF("doc_id", "ids")
    val budget = 16
    val packs = Packing.packIdSequences(docs, "doc_id", "ids",
      pmod(col("doc_id"), lit(2)), budget)
      .as[(String, Long, Seq[Int])].collect()
    // n_tokens is the array size; every non-final pack per shard full
    packs.foreach { case (_, n, ids) => assert(n == ids.size && n <= budget) }
    val byShard = packs.groupBy(_._1.split("-")(0))
    val input = docs.as[(Long, Seq[Int])].collect().sortBy(_._1)
    for ((shard, ps) <- byShard) {
      val ordered = ps.sortBy(_._1.split("-")(1).toInt)
      ordered.init.foreach { case (id, n, _) =>
        assert(n == budget, s"pack $id not full: $n")
      }
      // concatenated packs == concatenated per-doc id arrays in order
      val stream = ordered.flatMap(_._3).toSeq
      val expect = input.filter(_._1 % 2 == shard.toInt).flatMap(_._2).toSeq
      assert(stream == expect, s"shard $shard stream mismatch")
    }
    // layout independence: same packs on any partitioning
    val again = Packing.packIdSequences(docs.repartition(5), "doc_id", "ids",
      pmod(col("doc_id"), lit(2)), budget)
      .as[(String, Long, Seq[Int])].collect().toSet
    assert(again == packs.toSet)
    // empty id arrays contribute nothing (and crash nothing)
    val withEmpty = docs.unionByName(
      Seq((99L, Seq.empty[Int])).toDF("doc_id", "ids"))
    val pe = Packing.packIdSequences(withEmpty, "doc_id", "ids",
      pmod(col("doc_id"), lit(2)), budget)
      .as[(String, Long, Seq[Int])].collect()
    assert(pe.flatMap(_._3).toSet == packs.flatMap(_._3).toSet)
  }
}
