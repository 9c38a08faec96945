package graft.sources.dsv2

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas
import graft.sources.ShopifyClient

class ShopifySourceSpec extends SparkSpec {
  import spark.implicits._

  /** Fake API: serves edges, records whether the search filter arrived. */
  private class RecordingTransport(edges: Seq[String]) extends ShopifyClient.Transport {
    val bodies = mutable.Buffer[String]()
    def post(url: String, body: String, headers: Map[String, String]): String = {
      bodies += body
      s"""{"data": {"orders": {"edges": [${edges.mkString(",")}],
         |"pageInfo": {"hasNextPage": false, "endCursor": "c0"}}}}""".stripMargin
    }
    def get(url: String): String = ""
  }

  private def edge(id: Long, updated: String): String =
    s"""{"node": {"id": "gid://shopify/Order/$id", "name": "#$id",
       |"updatedAt": "$updated", "confirmed": true,
       |"totalPriceSet": {"shopMoney": {"amount": "10.00", "currencyCode": "USD"}}}}"""
      .stripMargin.replace("\n", " ")

  private def read() = spark.read.format("shopify")
    .option("shop", "acme.myshopify.com").option("token", "t")
    .option("resource", "orders").option("graphql", "query q")
    .load()

  test("reads edges through the DSv2 source by short name") {
    val t = new RecordingTransport(Seq(
      edge(1, "2025-12-01T00:00:00Z"), edge(2, "2025-12-05T00:00:00Z")))
    ShopifySource.transportOverride = Some(t)
    try {
      val df = read()
      assert(df.schema.fieldNames.toSeq == Seq("updated_at", "edge"))
      assert(df.count() == 2)
      // downstream parse path: edge JSON → node schema → flatten
      val nodes = df.select(
        from_json($"edge", Schemas.edge(Schemas.orderNode)).as("e"))
        .select($"e.node".as("n")).select("n.*")
      val flat = graft.silver.Flatten.orders(nodes, "R-")
      assert(flat.select("order_id").as[String].collect().toSet == Set("R-1", "R-2"))
    } finally ShopifySource.transportOverride = None
  }

  test("updated_at range filters are pushed into the API search query") {
    val t = new RecordingTransport(Seq(edge(2, "2025-12-05T00:00:00Z")))
    ShopifySource.transportOverride = Some(t)
    try {
      val df = read()
        .filter($"updated_at" > "2025-12-02T00:00:00Z" &&
          $"updated_at" < "2025-12-31T00:00:00Z")
      assert(df.count() == 1)
      val body = t.bodies.mkString
      assert(body.contains("updated_at:>'2025-12-02T00:00:00Z'"),
        s"expected pushed since-filter in request: $body")
      assert(body.contains("updated_at:<'2025-12-31T00:00:00Z'"))
      // and the plan reports the pushdown
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShopifyScan(pushedFilter=Some"), plan)
    } finally ShopifySource.transportOverride = None
  }

  test(">= pushes an inclusive bound (watermark boundary row preserved)") {
    val t = new RecordingTransport(Seq(edge(2, "2025-12-05T00:00:00Z")))
    ShopifySource.transportOverride = Some(t)
    try {
      read().filter($"updated_at" >= "2025-12-05T00:00:00Z").count()
      val body = t.bodies.mkString
      assert(body.contains("updated_at:&gt;=") || body.contains("updated_at:>="),
        s"expected inclusive >= pushed, got: $body")
    } finally ShopifySource.transportOverride = None
  }

  test("Spark re-verifies residual filters (server pre-filter is a superset)") {
    // server ignores the filter and returns an out-of-range edge too
    val t = new RecordingTransport(Seq(
      edge(1, "2025-11-01T00:00:00Z"), edge(2, "2025-12-05T00:00:00Z")))
    ShopifySource.transportOverride = Some(t)
    try {
      val df = read().filter($"updated_at" > "2025-12-01T00:00:00Z")
      // residual Spark-side filter drops the stale row even though the
      // fake server returned it
      assert(df.count() == 1)
    } finally ShopifySource.transportOverride = None
  }
}
