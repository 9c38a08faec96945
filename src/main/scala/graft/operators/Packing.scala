package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: place chunked documents into fixed token budgets
  * (the batch-assembly step between chunking and training).
  *
  * The classic greedy bin-packer is inherently sequential; the
  * distributable formulation is CONCAT-AND-SPLIT PER SHARD: within each
  * shard, lay the chunks out in a deterministic total order, take the
  * running token offset, and cut packs every `budget` tokens. A chunk
  * that straddles a cut is SPLIT across the adjacent packs — one
  * output row per (chunk, pack) span — so every pack holds EXACTLY
  * `budget` tokens (only each shard's final pack is shorter), which is
  * what a fixed-context training buffer needs. Documents crossing pack
  * boundaries is the standard pretraining-packing trade.
  *
  * Each shard packs independently (one window partition each, all
  * shards in parallel), so the operator scales by adding shards — a
  * GLOBAL running offset would serialize the corpus through one
  * partition, the q44-style anti-pattern this shape exists to avoid.
  *
  * Output adds: `pack_id` — globally unique "shard-ordinal" pack key;
  * `pack_offset` — the span's token start within its pack;
  * `span_tokens` — how many of the chunk's tokens land in this pack;
  * `span_start` — where the span begins within the chunk. All integer
  * arithmetic on exact counts → bit-stable on any layout.
  */
object Packing {

  def packChunks(chunks: DataFrame, tokensCol: String, orderCols: Seq[String],
                 shardCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("__shard"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      // zero-token chunks occupy no span (and would otherwise produce a
      // DESCENDING sequence() below); drop them up front
      .filter(col(tokensCol) > 0)
      .withColumn("__shard", shardCol)
      .withColumn("__end", sum(col(tokensCol)).over(w))
      .withColumn("__start", col("__end") - col(tokensCol))
      // one row per pack this chunk touches: floor(start/b)..floor((end-1)/b)
      .withColumn("__pack", explode(sequence(
        floor(col("__start") / budget).cast("long"),
        floor((col("__end") - 1) / budget).cast("long"))))
      .withColumn("pack_id",
        concat_ws("-", col("__shard").cast("string"), col("__pack").cast("string")))
      .withColumn("__pack_lo", col("__pack") * budget)
      .withColumn("__span_from", greatest(col("__start"), col("__pack_lo")))
      .withColumn("__span_to",
        least(col("__end"), col("__pack_lo") + budget))
      .withColumn("pack_offset", (col("__span_from") - col("__pack_lo")).cast("long"))
      .withColumn("span_start", (col("__span_from") - col("__start")).cast("long"))
      .withColumn("span_tokens", (col("__span_to") - col("__span_from")).cast("long"))
      .drop("__shard", "__end", "__start", "__pack", "__pack_lo",
        "__span_from", "__span_to")
  }

  /** MATERIALIZE the packed training sequences: documents carrying a
    * token-id array become `(pack_id, n_tokens, ids)` rows where every
    * pack holds exactly `budget` ids (each shard's last pack may be
    * shorter) — the "corpus → fixed-context training batches" step,
    * with real ids, not just span bookkeeping.
    *
    * Built on [[packChunks]]'s span math: per-document pack spans from
    * the running offsets, the id slice for each span cut with
    * `slice()` (a codegen array op), then ONE shuffle on `pack_id` to
    * assemble — and assembly is order-deterministic because the pieces
    * sort by `pack_offset` inside the aggregate (`array_sort` over
    * structs), never by arrival order. Per-pack state is bounded by
    * `budget` ids, so the assembly aggregate cannot blow up on skew;
    * total moved data is exactly the corpus's ids, once.
    */
  def packIdSequences(docs: DataFrame, idCol: String, idsCol: String,
                      shardCol: Column, budget: Int): DataFrame = {
    val spans = packChunks(
      docs.select(col(idCol), col(idsCol))
        .withColumn("__n", size(col(idsCol)).cast("long")),
      "__n", Seq(idCol), shardCol, budget)
    spans
      .select(col("pack_id"),
        struct(col("pack_offset").as("o"),
          slice(col(idsCol), (col("span_start") + 1).cast("int"),
            col("span_tokens").cast("int")).as("p")).as("__piece"))
      .groupBy("pack_id")
      .agg(flatten(transform(array_sort(collect_list(col("__piece"))),
        x => x.getField("p"))).as("ids"))
      .select(col("pack_id"), size(col("ids")).cast("long").as("n_tokens"),
        col("ids"))
  }
}
