package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ShopifyFunctions._

class ShopifyFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("F1 cleanId: suffix after last slash, prefixed; null-safe") {
    val df = Seq(
      Some("gid://shopify/Order/5551234"),
      Some("no-slashes"),
      None).toDF("gid")
    val out = df.select(cleanId($"gid", "R-")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("R-5551234"), Some("R-no-slashes"), None))
  }

  test("F1 cleanId: empty prefix for product/variant ids") {
    val out = Seq("gid://shopify/ProductVariant/31").toDF("gid")
      .select(cleanId($"gid", "")).as[String].head()
    assert(out == "31")
  }

  test("F2 safeCast: default on garbage and on null") {
    val df = Seq(Some("14"), Some("about 2 years"), None).toDF("v")
    val out = df.select(safeCast($"v", "int", 0)).as[Int].collect()
    assert(out.toSeq == Seq(14, 0, 0))
  }

  test("F3 money: shopMoney wins; bare amount fallback; empty → 0.0") {
    val rows = Seq(
      """{"m": {"shopMoney": {"amount": "112.50", "currencyCode": "USD"}}}""",
      """{"m": {"shopMoney": {"amount": "7.50"}}}""",
      """{"m": {"amount": "1500.00", "currencyCode": "USD"}}""",
      """{"m": {"shopMoney": {"currencyCode": "USD"}, "amount": "9.99"}}""",
      """{"m": null}""",
      """{"m": {}}""")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("m", graft.model.Schemas.moneySet)))
    val df = spark.read.schema(schema).json(spark.createDataset(rows))
    val out = df.select(money($"m")).as[Double].collect()
    // row 4: shopMoney non-empty (currencyCode set) but amount null → 0.0,
    // NOT the outer 9.99 (mirrors incremental_loaders.py:71-77)
    assert(out.toSeq == Seq(112.50, 7.50, 1500.00, 0.0, 0.0, 0.0))
  }

  test("F4 joinTags: comma join, null → empty string") {
    val df = Seq(
      (1, Some(Seq("vip", "promo"))),
      (2, Some(Seq.empty[String])),
      (3, Option.empty[Seq[String]])).toDF("id", "tags")
    val out = df.orderBy("id").select(joinTags($"tags")).as[String].collect()
    assert(out.toSeq == Seq("vip,promo", "", ""))
  }

  test("F5 stripHash: removes #, null → empty") {
    val df = Seq(Some("#1001"), Some("1001"), None).toDF("name")
    val out = df.select(stripHash($"name")).as[String].collect()
    assert(out.toSeq == Seq("1001", "1001", ""))
  }

  test("F6 pyStr: Python str() spellings incl None") {
    val df = Seq(Some(true), Some(false), None).toDF("b")
    val out = df.select(pyStr($"b")).as[String].collect()
    assert(out.toSeq == Seq("True", "False", "None"))
  }

  test("F7 normKey: upper+trim") {
    val out = Seq("  wid-001 ").toDF("sku").select(normKey($"sku")).as[String].head()
    assert(out == "WID-001")
  }

  test("F8 timestamp renders") {
    val df = Seq("2025-12-08 05:46:01").toDF("ts")
      .select(col("ts").cast("timestamp").as("ts"))
    assert(df.select(tsCompact($"ts")).as[String].head() == "20251208_054601")
    assert(df.select(tsIso($"ts")).as[String].head() == "2025-12-08T05:46:01")
    assert(df.select(tsDate($"ts")).as[String].head() == "2025-12-08")
  }
}
