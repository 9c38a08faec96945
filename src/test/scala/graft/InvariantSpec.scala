package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, MergeOps}

/** Randomized invariant checks (SURVEY §5.3): seeded generators, 20
  * trials each — the properties the pipeline's correctness rests on. */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randomTable(n: Int, keySpace: Int) =
    (0 until n).map(_ => (rnd.nextInt(keySpace).toString,
      rnd.nextInt(1000), rnd.nextDouble())).toDF("k", "v", "x")

  test("upsert: idempotent, key-unique when staged is key-unique, staged wins") {
    (1 to 10).foreach { _ =>
      val target = MergeOps.dedupLatest(randomTable(50, 30),
        Seq($"k"), Seq($"v".desc, $"x".desc))
      val staged = MergeOps.dedupLatest(randomTable(20, 30),
        Seq($"k"), Seq($"v".desc, $"x".desc))
      val once = MergeOps.upsert(target, staged, Seq("k")).cache()
      val twice = MergeOps.upsert(once, staged, Seq("k"))
      assert(once.orderBy("k", "v", "x").collect().toSeq ==
        twice.orderBy("k", "v", "x").collect().toSeq, "idempotence")
      assert(once.groupBy("k").count().filter($"count" > 1).count() == 0, "key-unique")
      val stagedKeys = staged.select("k").as[String].collect().toSet
      val stagedRows = staged.collect().map(_.toSeq).toSet
      assert(once.filter($"k".isin(stagedKeys.toSeq: _*)).collect()
        .map(_.toSeq).forall(stagedRows.contains), "staged wins")
    }
  }

  test("deleteReload: target keys either fully replaced or untouched") {
    (1 to 10).foreach { _ =>
      val target = randomTable(60, 15)
      val staged = randomTable(25, 15)
      val out = MergeOps.deleteReload(target, staged, staged.select("k"), Seq("k")).cache()
      val stagedKeys = staged.select("k").as[String].collect().toSet
      // rows under staged keys come only from staged; others only from target
      val stagedRows = staged.collect().map(_.toSeq).toSet
      val targetRows = target.collect().map(_.toSeq).toSet
      out.collect().foreach { r =>
        if (stagedKeys(r.getString(0))) assert(stagedRows(r.toSeq))
        else assert(targetRows(r.toSeq))
      }
      assert(out.count() ==
        staged.count() + target.filter(!$"k".isin(stagedKeys.toSeq: _*)).count())
    }
  }

  test("dedupLatest: exactly one row per key, and it is the max by order") {
    (1 to 10).foreach { _ =>
      val df = randomTable(80, 20).cache()
      val out = MergeOps.dedupLatest(df, Seq($"k"), Seq($"v".desc, $"x".desc))
      val expect = df.collect().map(r => (r.getString(0), (r.getInt(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).max }
      val got = out.collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
      assert(got == expect)
    }
  }

  test("explode conservation: sum(line_items_count) == item rows") {
    import graft.model.Schemas
    import graft.sources.RawReader
    (1 to 5).foreach { _ =>
      val nodes = (0 until 20).map { i =>
        val items = (0 until rnd.nextInt(5)).map(j =>
          s"""{"node": {"id": "gid://shopify/LineItem/$i$j", "quantity": ${rnd.nextInt(9)}}}""")
        s"""{"id": "gid://shopify/Order/$i", "updatedAt": "2025-01-0${1 + i % 9}T00:00:00Z",
           |"lineItems": {"edges": [${items.mkString(",")}]}}""".stripMargin.replace("\n", " ")
      }
      val path = Fixtures.writeTemp(Fixtures.envelope(nodes, "retail", "orders"), "o.json")
      val parsed = RawReader.readJson(spark, Schemas.orderNode, "orders", path)
      val orders = silver.Flatten.orders(parsed, "R-")
      val items = silver.Flatten.orderItems(parsed, "R-")
      val total = orders.agg(coalesce(sum($"line_items_count"), lit(0L))).as[Long].head()
      assert(total == items.count())
      val totalQty = orders.agg(coalesce(sum($"total_quantity"), lit(0L))).as[Long].head()
      val itemQty = items.agg(coalesce(sum($"quantity"), lit(0L))).as[Long].head()
      assert(totalQty == itemQty)
    }
  }

  test("minhash LSH: recall on exact duplicates is total; jaccard in [0,1]") {
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 until 25).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")))
    val withDups = (docs ++ docs.take(6).map { case (i, t) => (100 + i, t) })
      .toDF("id", "text")
    val pairs = Dedup.minhashDuplicates(withDups, "id", "text", 0.99).cache()
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 6).foreach(i => assert(found.contains((i.toLong, 100L + i))))
    pairs.select("jaccard").as[Double].collect()
      .foreach(j => assert(j >= 0.0 && j <= 1.0))
  }

  test("watermark monotone under union") {
    import graft.model.Schemas
    import graft.sources.RawReader
    val a = Fixtures.writeTemp(
      Fixtures.envelope(Seq(Fixtures.orderNodes), "retail", "orders"), "a.json")
    val b = Fixtures.writeTemp(
      Fixtures.envelope(Seq(Fixtures.orderNodeSparse), "retail", "orders"), "b.json")
    val wa = silver.Flatten.watermark(RawReader.readJson(spark, Schemas.orderNode, "orders", a))
    val wb = silver.Flatten.watermark(RawReader.readJson(spark, Schemas.orderNode, "orders", b))
    val wu = silver.Flatten.watermark(
      RawReader.readJson(spark, Schemas.orderNode, "orders", a).unionByName(
        RawReader.readJson(spark, Schemas.orderNode, "orders", b)))
    assert(wu == Seq(wa, wb).flatten.maxOption)
  }
}
