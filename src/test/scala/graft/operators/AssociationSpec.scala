package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: all unordered pairs by nested loops. */
  private def brute(baskets: Seq[(Long, String)], minSupport: Long)
  : Map[(String, String), (Long, Long, Long)] = {
    val b = baskets.distinct
    val ci = b.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    val byBasket = b.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.sorted }
    val cab = byBasket.toSeq.flatMap { items =>
      for (i <- items.indices; j <- i + 1 until items.size) yield (items(i), items(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    cab.collect { case ((a, b2), c) if c >= minSupport => (a, b2) -> (c, ci(a), ci(b2)) }
  }

  test("pair counts, marginals and ppm metrics match brute force") {
    val rnd = new scala.util.Random(7)
    val items = ('a' to 'j').map(_.toString)
    val rows = (1 to 400).flatMap { basket =>
      (0 until 1 + rnd.nextInt(5)).map(_ => (basket.toLong, items(rnd.nextInt(items.size))))
    } ++ Seq((1L, "a"), (1L, "a")) // duplicate lines must not double-count
    val minSupport = 3L
    val exp = brute(rows, minSupport)
    val nBaskets = rows.map(_._1).distinct.size.toLong

    val got = Association.rules(rows.toDF("bk", "it"), "bk", "it",
        minSupport, topK = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap

    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (cab, ca, cb, n, lift, confAb, confBa)) =>
      val (ecab, eca, ecb) = exp(k)
      assert((cab, ca, cb) == (ecab, eca, ecb), k)
      assert(n == nBaskets)
      assert(lift == 1000000L * ecab * nBaskets / (eca * ecb), k)
      assert(confAb == 1000000L * ecab / eca, k)
      assert(confBa == 1000000L * ecab / ecb, k)
    }
  }

  test("apriori item prune drops no rule at or above minSupport") {
    // item z appears often but never pairs >= minSupport; rare item r
    // is pruned at the item level — neither may distort survivors
    val rows = (1 to 60).map(i => (i.toLong, "x")) ++
      (1 to 60).map(i => (i.toLong, "y")) ++
      (61 to 70).map(i => (i.toLong, "z")) ++
      Seq((1L, "r"))
    val out = Association.rules(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 50, topK = 10)
      .select("item_a", "item_b", "cab").as[(String, String, Long)].collect().toList
    assert(out == List(("x", "y", 60L)))
  }

  test("null baskets and items are ignored; topK truncates by lift order") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), Some("a")), (Some(2L), Some("b")),
      (Some(2L), None), (None, Some("c"))
    ).toDF("bk", "it")
    val out = Association.rules(df, "bk", "it", minSupport = 1, topK = 1)
      .select("item_a", "item_b", "cab", "n_baskets")
      .as[(String, String, Long, Long)].collect().toList
    assert(out == List(("a", "b", 2L, 2L)))
  }

  test("plan: marginals and frequent set attach by broadcast, one pair shuffle") {
    val rows = (1 to 50).flatMap(i => Seq((i.toLong, "a"), (i.toLong, "b")))
    val plan = Association.rules(rows.toDF("bk", "it"), "bk", "it", 2, 5)
      .queryExecution.executedPlan.toString
    val main = plan.split("== Initial Plan ==")(0)
    assert(main.contains("BroadcastHashJoin"), main)
    assert(!main.contains("SortMergeJoin") && !main.contains("CartesianProduct"), main)
  }

  test("plan: only frequent-filtered marginals broadcast (no unbounded hint)") {
    // the support filter must sit on EVERY broadcast count-table
    // branch: the frequent semi-join side plus both marginal sides --
    // an unfiltered item-marginal broadcast is unbounded at a
    // web-scale item domain
    val rows = (1 to 50).flatMap(i => Seq((i.toLong, "a"), (i.toLong, "b")))
    val opt = Association.rules(rows.toDF("bk", "it"), "bk", "it", 2, 5)
      .queryExecution.optimizedPlan.toString
    val nSupportFilters = "__c#\\d+L? >= 2".r.findAllIn(opt).length
    assert(nSupportFilters >= 3, s"want >= 3 support filters, got $nSupportFilters:\n$opt")
  }
}
