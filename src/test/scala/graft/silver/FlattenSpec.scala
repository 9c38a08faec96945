package graft.silver

import org.apache.spark.sql.DataFrame
import graft.{Fixtures, SparkSpec}
import graft.model.Schemas
import graft.sources.RawReader

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orderNodes: DataFrame = RawReader.readJson(
    spark, Schemas.orderNode, "orders",
    Fixtures.writeTemp(
      Fixtures.envelope(Seq(Fixtures.orderNodes, Fixtures.orderNodeSparse), "retail", "orders"),
      "orders.json"))

  private lazy val customerNodes: DataFrame = RawReader.readJson(
    spark, Schemas.customerNode, "customers",
    Fixtures.writeTemp(
      Fixtures.envelopeNested(Seq(Fixtures.customerNode, Fixtures.customerNodeSparse), "customers"),
      "customers.json"))

  private lazy val productNodes: DataFrame = RawReader.readJson(
    spark, Schemas.productNode, "products",
    Fixtures.writeTemp(
      Fixtures.bareList(Seq(Fixtures.productNode, Fixtures.productNodeSparse)),
      "products.json"))

  test("P2 orders flatten: 28 cols, money chain, array-side aggregates") {
    val df = Flatten.orders(orderNodes, "R-")
    assert(df.columns.toSeq == Schemas.schemaMap("fact_orders"))
    val full = df.filter($"order_id" === "R-5551234").head()
    assert(full.getAs[String]("order_number") == "1001")
    assert(full.getAs[String]("confirmed") == "True")
    assert(full.getAs[String]("tags") == "vip,promo")
    assert(full.getAs[Double]("subtotal") == 100.0)
    assert(full.getAs[Double]("total_price") == 112.5)
    assert(full.getAs[Double]("total_tax") == 7.5)
    assert(full.getAs[String]("currency") == "USD")
    assert(full.getAs[String]("customer_id") == "R-777")
    assert(full.getAs[String]("shipping_city") == "Austin")
    assert(full.getAs[Int]("line_items_count") == 2)
    assert(full.getAs[Int]("total_quantity") == 3)

    val sparse = df.filter($"order_id" === "R-5551235").head()
    assert(sparse.getAs[String]("order_number") == "1002") // no '#'
    assert(sparse.getAs[String]("confirmed") == "False")   // absent → "False"
    assert(sparse.getAs[String]("tags") == "")
    // flat {amount} money fallback (no shopMoney)
    assert(sparse.getAs[Double]("total_price") == 50.0)
    assert(sparse.getAs[String]("customer_id") == null)    // null customer
    assert(sparse.getAs[String]("shipping_city") == null)
    assert(sparse.getAs[Int]("line_items_count") == 0)     // missing lineItems
    assert(sparse.getAs[Int]("total_quantity") == 0)
  }

  test("P3 order items: explode with null variant/product tolerated") {
    val df = Flatten.orderItems(orderNodes, "R-")
    assert(df.columns.toSeq == Schemas.schemaMap("fact_order_items"))
    assert(df.count() == 2) // sparse order contributes no rows
    val li91 = df.filter($"line_item_id" === "R-91").head()
    assert(li91.getAs[String]("order_id") == "R-5551234")
    assert(li91.getAs[Int]("quantity") == 2)
    assert(li91.getAs[String]("variant_id") == "31") // no prefix on variant
    assert(li91.getAs[String]("product_id") == "11")
    assert(li91.getAs[Double]("original_price") == 30.0)
    val li92 = df.filter($"line_item_id" === "R-92").head()
    assert(li92.getAs[String]("variant_id") == null)
    assert(li92.getAs[Double]("original_price") == 0.0) // null money set → 0.0
  }

  test("A2 conservation: sum(line_items_count) == item row count") {
    val orders = Flatten.orders(orderNodes, "R-")
    val items = Flatten.orderItems(orderNodes, "R-")
    val total = orders.agg(org.apache.spark.sql.functions.sum($"line_items_count"))
      .as[Long].head()
    assert(total == items.count())
  }

  test("P1 customers flatten: 26 cols + null-struct tolerance") {
    val df = Flatten.customers(customerNodes, "R-")
    assert(df.columns.toSeq == Schemas.schemaMap("dim_customers"))
    val ada = df.filter($"customer_id" === "R-777").head()
    assert(ada.getAs[String]("tax_exempt") == "False")
    assert(ada.getAs[Int]("number_of_orders") == 14)
    assert(ada.getAs[Double]("amount_spent") == 1500.0)
    assert(ada.getAs[String]("currency") == "USD")
    assert(ada.getAs[String]("last_order_id") == "R-5551234")
    assert(ada.getAs[String]("rfm_group") == "CHAMPIONS")
    assert(ada.getAs[String]("tags") == "")
    val bob = df.filter($"customer_id" === "R-778").head()
    assert(bob.getAs[String]("tax_exempt") == "None") // null → "None"
    assert(bob.getAs[Int]("number_of_orders") == 0)   // garbage → 0
    assert(bob.getAs[Double]("amount_spent") == 0.0)
    assert(bob.getAs[String]("address1") == null)
    assert(bob.getAs[String]("predicted_spend_tier") == null)
  }

  test("P4/P5 products + variants flatten") {
    val prods = Flatten.products(productNodes)
    assert(prods.columns.toSeq == Schemas.schemaMap("dim_products"))
    val w = prods.filter($"product_id" === "11").head()
    assert(w.getAs[String]("tracks_inventory") == "True")
    assert(w.getAs[String]("tags") == "hardware")
    val old = prods.filter($"product_id" === "12").head()
    assert(old.getAs[String]("tracks_inventory") == "None")

    val vars = Flatten.variants(productNodes)
    assert(vars.columns.toSeq == Schemas.schemaMap("dim_product_variants"))
    val v31 = vars.filter($"variant_id" === "31").head()
    assert(v31.getAs[Double]("price") == 30.0)
    assert(v31.getAs[Double]("compare_at_price") == 0.0) // null → 0.0
    assert(v31.getAs[String]("available_for_sale") == "True")
    val v32 = vars.filter($"variant_id" === "32").head()
    assert(v32.getAs[Double]("price") == 0.0) // "unknown" → 0.0
  }

  test("P6 inventory roll-up: buckets summed across locations") {
    val inv = Flatten.currentInventory(productNodes)
    assert(inv.columns.toSeq == Schemas.schemaMap("fact_current_inventory"))
    val i31 = inv.filter($"variant_id" === "31").head()
    assert(i31.getAs[Int]("available") == 8)  // 5 + 3
    assert(i31.getAs[Int]("on_hand") == 10)   // 7 + 3
    assert(i31.getAs[Int]("committed") == 2)
    assert(i31.getAs[Int]("incoming") == 0)
    assert(i31.getAs[Int]("reserved") == 0)   // missing in 2nd level → 0
    assert(i31.getAs[String]("inventory_id") == "41")
    val i32 = inv.filter($"variant_id" === "32").head()
    assert(i32.getAs[Int]("available") == 0)  // null inventoryItem
    assert(i32.getAs[String]("inventory_id") == null)
  }

  test("P7 snapshot stamping") {
    val snap = Flatten.inventorySnapshot(productNodes, "2025-12-08T05:46:00", "2025-12-08")
    assert(snap.columns.toSeq == Schemas.schemaMap("inventory_snapshot"))
    val s31 = snap.filter($"variant_id" === "31").head()
    assert(s31.getAs[String]("product_title") == "Widget")
    assert(s31.getAs[String]("sku") == "WID-001")
    assert(s31.getAs[Int]("available") == 8)
    assert(s31.getAs[String]("snapshot_date") == "2025-12-08")
  }

  test("A1 watermark: lexicographic max updatedAt") {
    assert(Flatten.watermark(orderNodes).contains("2025-12-07T12:30:00Z"))
    assert(Flatten.watermark(productNodes).contains("2025-12-07T08:00:00Z"))
  }

  test("P8 conform: absent declared column becomes null") {
    val df = Seq(("a", 1)).toDF("order_id", "quantity")
    val out = Flatten.conform(df, "fact_order_items")
    assert(out.columns.toSeq == Schemas.schemaMap("fact_order_items"))
    assert(out.head().getAs[String]("title") == null)
  }
}
