package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ShopifyFunctions.normKey

/** W6 — the fact_current_inventory pipeline (run_logs.txt:335-435):
  * per store, join inventory × variants × active products, dedup to the
  * newest variant per normalized SKU; then retail-first gap-fill union.
  *
  * Scale notes: variant/product dims are small → broadcast joins; the
  * per-store dedup is one shuffle on `sku`; the gap-fill anti-join
  * reuses that same key so AQE plans it without an extra exchange.
  * `NOT IN` maps safely to `left_anti` because SKUs are pre-filtered
  * non-null (run_logs.txt:359; SURVEY §7.3 quirk table).
  */
object InventoryPipeline {

  /** One store's deduped inventory (the `retail_data`/`wholesale_data`
    * CTE, run_logs.txt:344-379). */
  def storeInventory(inventory: DataFrame, variants: DataFrame,
                     products: DataFrame, sourceSystem: String): DataFrame = {
    val v = variants.select(col("variant_id"), col("sku"), col("created_at"))
    val p = products.filter(col("status") === "ACTIVE").select(col("product_id"))
    val joined = inventory
      .join(broadcast(v), Seq("variant_id"))
      .join(broadcast(p), Seq("product_id"))
      .filter(col("sku").isNotNull && trim(col("sku")) =!= "")
      .withColumn("sku", normKey(col("sku")))
    MergeOps.dedupLatest(joined,
        keys = Seq(col("sku")),
        // DISTINCT ON ties are nondeterministic in Postgres; we add
        // variant_id DESC as a documented total order (SURVEY §7.3)
        order = Seq(col("created_at").desc, col("variant_id").desc))
      .select(col("sku"), col("available"), col("committed"), col("on_hand"),
        col("incoming"), col("reserved"), col("variant_id"), col("product_id"),
        lit(sourceSystem).as("source_system"))
  }

  /** Retail-first gap fill (run_logs.txt:381-391): all retail rows, plus
    * wholesale rows whose SKU is absent from retail. */
  def combine(retail: DataFrame, wholesale: DataFrame): DataFrame =
    retail.unionByName(
      wholesale.join(retail.select("sku"), Seq("sku"), "left_anti"))
}
