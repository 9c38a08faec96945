package graft.model

import graft.{Fixtures, SparkSpec}
import graft.silver.Flatten
import graft.sources.RawReader

class WarehouseSpec extends SparkSpec {

  test("flattened frames round-trip through the typed warehouse API") {
    import Warehouse._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val orderNodes = RawReader.readJson(spark, Schemas.orderNode, "orders",
      Fixtures.writeTemp(
        Fixtures.envelope(Seq(Fixtures.orderNodes, Fixtures.orderNodeSparse),
          "retail", "orders"), "o.json"))
    val typedOrders = Flatten.conform(Flatten.orders(orderNodes, "R-"), "fact_orders")
      .asOrders
    val rows = typedOrders.collect().sortBy(_.order_id)
    assert(rows.map(_.order_id).toSeq == Seq("R-5551234", "R-5551235"))
    assert(rows.head.total_price == 112.5)
    assert(rows.head.line_items_count == 2)
    // typed transformations compose
    import spark.implicits._
    val revenue = typedOrders.map(o => o.total_price - o.total_discounts)
      .collect().sorted
    assert(revenue.toSeq == Seq(50.0, 107.5))

    val items = Flatten.conform(Flatten.orderItems(orderNodes, "R-"), "fact_order_items")
      .asOrderItems
    assert(items.collect().map(_.quantity).sum == 3)
  }
}
