package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the three bronze GraphQL envelopes and the seven
  * warehouse tables.
  *
  * The reference declares staging schemas via `SCHEMA_MAP`
  * (incremental_loaders.py:22-57) and implicitly declares extraction
  * schemas through its GraphQL query files (reconstructed in
  * FIXTURES.md from loader access paths). Schemas are explicit here —
  * JSON schema inference is for dev only (SURVEY §1.2).
  */
object Schemas {

  /** Money set: `{shopMoney: {amount, currencyCode}}` with a bare
    * `{amount}` fallback (incremental_loaders.py:71-77). Amounts arrive
    * as JSON strings. */
  val moneySet: StructType = StructType(Seq(
    StructField("shopMoney", StructType(Seq(
      StructField("amount", StringType),
      StructField("currencyCode", StringType)))),
    StructField("amount", StringType),
    StructField("currencyCode", StringType)))

  val address: StructType = StructType(Seq(
    StructField("address1", StringType), StructField("address2", StringType),
    StructField("city", StringType), StructField("province", StringType),
    StructField("country", StringType), StructField("zip", StringType),
    StructField("phone", StringType), StructField("company", StringType)))

  /** One customer node (FIXTURES.md §3; incremental_loaders.py:125-165). */
  val customerNode: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("firstName", StringType), StructField("lastName", StringType),
    StructField("email", StringType), StructField("phone", StringType),
    StructField("createdAt", StringType), StructField("updatedAt", StringType),
    StructField("state", StringType), StructField("taxExempt", BooleanType),
    StructField("tags", ArrayType(StringType)), StructField("note", StringType),
    StructField("numberOfOrders", StringType),
    StructField("lifetimeDuration", StringType),
    StructField("amountSpent", StructType(Seq(
      StructField("amount", StringType), StructField("currencyCode", StringType)))),
    StructField("defaultAddress", address),
    StructField("lastOrder", StructType(Seq(
      StructField("id", StringType), StructField("createdAt", StringType)))),
    StructField("statistics", StructType(Seq(
      StructField("predictedSpendTier", StringType),
      StructField("rfmGroup", StringType))))))

  /** One line-item node (FIXTURES.md §2; incremental_loaders.py:201-221). */
  val lineItemNode: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("quantity", StringType), // safe int cast downstream
    StructField("title", StringType),
    StructField("originalUnitPriceSet", moneySet),
    StructField("discountedUnitPriceSet", moneySet),
    StructField("variant", StructType(Seq(StructField("id", StringType)))),
    StructField("product", StructType(Seq(StructField("id", StringType))))))

  /** One order node (FIXTURES.md §2; incremental_loaders.py:185-255). */
  val orderNode: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("createdAt", StringType), StructField("updatedAt", StringType),
    StructField("processedAt", StringType), StructField("cancelledAt", StringType),
    StructField("cancelReason", StringType), StructField("confirmed", BooleanType),
    StructField("tags", ArrayType(StringType)),
    StructField("displayFulfillmentStatus", StringType),
    StructField("sourceName", StringType),
    StructField("subtotalPriceSet", moneySet),
    StructField("totalPriceSet", moneySet),
    StructField("totalTaxSet", moneySet),
    StructField("totalDiscountsSet", moneySet),
    StructField("totalShippingPriceSet", moneySet),
    StructField("customer", StructType(Seq(StructField("id", StringType)))),
    StructField("shippingAddress", address),
    StructField("lineItems", StructType(Seq(
      StructField("edges", ArrayType(edge(lineItemNode))))))))

  val quantities: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType), StructField("quantity", StringType))))
  val inventoryLevelNode: StructType =
    StructType(Seq(StructField("quantities", quantities)))
  val variantNode: StructType = StructType(Seq(
      StructField("id", StringType), StructField("sku", StringType),
      StructField("price", StringType), StructField("compareAtPrice", StringType),
      StructField("availableForSale", BooleanType),
      StructField("createdAt", StringType), StructField("updatedAt", StringType),
      StructField("inventoryItem", StructType(Seq(
        StructField("id", StringType),
        StructField("inventoryLevels", StructType(Seq(
          StructField("edges", ArrayType(edge(inventoryLevelNode)))))))))))

  /** One product node with nested variants → inventory levels
    * (FIXTURES.md §4; incremental_loaders.py:275-348). */
  val productNode: StructType = StructType(Seq(
      StructField("id", StringType), StructField("title", StringType),
      StructField("handle", StringType), StructField("productType", StringType),
      StructField("vendor", StringType), StructField("status", StringType),
      StructField("createdAt", StringType), StructField("updatedAt", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("tracksInventory", BooleanType),
      StructField("variants", StructType(Seq(
        StructField("edges", ArrayType(edge(variantNode))))))))

  /** An edge that tolerates a missing `node` wrapper: the node fields
    * appear both nested under `node` and inlined at the top level, so
    * `entry.get('node', entry)` (incremental_loaders.py:119) maps to
    * `when(node.isNotNull, node).otherwise(struct(topLevelFields))`. */
  def edge(node: StructType): StructType =
    StructType(node.fields :+ StructField("node", node))

  val envelopeMetadata: StructType = StructType(Seq(
    StructField("store_type", StringType),
    StructField("entity_type", StringType),
    StructField("extracted_at", StringType),
    StructField("record_count", LongType),
    StructField("shop_name", StringType)))

  /** Raw-file envelope variant 1: `{metadata:{...}, data:[edge,...]}`
    * (extract_table.py:230-241). */
  def envelope(node: StructType): StructType =
    StructType(Seq(
      StructField("metadata", envelopeMetadata),
      StructField("data", ArrayType(edge(node)))))

  /** Raw-file envelope variant 2: `{data: {<entity>: {edges: [...]}}}`
    * — the raw GraphQL response shape (incremental_loaders.py:120-122). */
  def envelopeNested(node: StructType, entity: String): StructType =
    StructType(Seq(
      StructField("metadata", envelopeMetadata),
      StructField("data", StructType(Seq(
        StructField(entity, StructType(Seq(
          StructField("edges", ArrayType(edge(node)))))))))))

  // ------------------------------------------------------------ warehouse
  /** Exact staging column lists from SCHEMA_MAP
    * (incremental_loaders.py:22-57), in declared order. */
  val schemaMap: Map[String, Seq[String]] = Map(
    "dim_customers" -> Seq(
      "customer_id", "first_name", "last_name", "email", "phone", "created_at",
      "updated_at", "state", "tax_exempt", "tags", "note", "number_of_orders",
      "lifetime_duration", "amount_spent", "currency", "address1", "address2",
      "city", "province", "country", "zip", "company", "last_order_id",
      "last_order_date", "predicted_spend_tier", "rfm_group"),
    "dim_products" -> Seq(
      "product_id", "title", "handle", "product_type", "vendor", "status",
      "created_at", "updated_at", "tags", "tracks_inventory"),
    "dim_product_variants" -> Seq(
      "product_id", "variant_id", "sku", "price", "compare_at_price",
      "available_for_sale", "created_at", "updated_at"),
    "fact_current_inventory" -> Seq(
      "product_id", "variant_id", "available", "on_hand", "committed",
      "incoming", "reserved", "inventory_id"),
    "inventory_snapshot" -> Seq(
      "product_id", "product_title", "variant_id", "sku", "available",
      "on_hand", "committed", "incoming", "reserved", "snapshot_ts",
      "snapshot_date"),
    "fact_orders" -> Seq(
      "order_id", "order_number", "created_at", "updated_at", "processed_at",
      "cancelled_at", "cancel_reason", "confirmed", "tags",
      "fulfillment_status", "subtotal", "currency", "total_price",
      "total_tax", "total_discounts", "total_shipping", "customer_id",
      "shipping_address1", "shipping_address2", "shipping_city",
      "shipping_province", "shipping_country", "shipping_zip",
      "shipping_phone", "shipping_company", "line_items_count",
      "total_quantity", "source_name"),
    "fact_order_items" -> Seq(
      "order_id", "line_item_id", "quantity", "variant_id", "product_id",
      "title", "original_price", "discounted_price"))
}
