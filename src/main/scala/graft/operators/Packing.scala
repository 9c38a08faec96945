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
  * running token offset, and cut packs every `budget` tokens. Each
  * shard packs independently (one window partition each, all shards in
  * parallel), so the operator scales by adding shards — a GLOBAL
  * running offset would serialize the corpus through one partition,
  * the q44-style anti-pattern this shape exists to avoid.
  *
  * A chunk longer than the budget still gets a pack of its own (packs
  * are cut at start offsets; oversized chunks overflow their pack, the
  * caller's chunker bounds chunk length ≤ budget in practice).
  *
  * Output adds: `pack_id` — globally unique (shard, ordinal) pack key;
  * `pack_offset` — the chunk's token start within its pack. All
  * integer arithmetic on exact counts → bit-stable anywhere.
  */
object Packing {

  def packChunks(chunks: DataFrame, tokensCol: String, orderCols: Seq[String],
                 shardCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("__shard"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__shard", shardCol)
      .withColumn("__end", sum(col(tokensCol)).over(w))
      .withColumn("__start", col("__end") - col(tokensCol))
      .withColumn("pack_seq", floor(col("__start") / budget).cast("long"))
      .withColumn("pack_id",
        concat_ws("-", col("__shard").cast("string"), col("pack_seq").cast("string")))
      .withColumn("pack_offset", (col("__start") - col("pack_seq") * budget).cast("long"))
      .drop("__shard", "__end", "__start")
  }
}
