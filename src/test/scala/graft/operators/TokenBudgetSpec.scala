package graft.operators

import graft.SparkSpec

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("waterFill: no source caps — proportional floored shares") {
    val out = TokenBudget.waterFill(
      Seq(("a", 1000L, 3L), ("b", 1000L, 1L)), budget = 400, rounds = 4)
    assert(out == Seq(("a", 1000L, 3L, 300L, false), ("b", 1000L, 1L, 100L, false)))
  }

  test("waterFill: a capped source redistributes its excess") {
    // a would get 300 but holds only 100; b absorbs the rest
    val out = TokenBudget.waterFill(
      Seq(("a", 100L, 3L), ("b", 10000L, 1L)), budget = 400, rounds = 4)
      .map(r => r._1 -> (r._4, r._5)).toMap
    assert(out("a") == ((100L, true)))
    assert(out("b") == ((300L, false))) // full remaining budget
  }

  test("waterFill: cascade — redistribution caps a second source") {
    val out = TokenBudget.waterFill(
      Seq(("a", 10L, 5L), ("b", 50L, 4L), ("c", 100000L, 1L)),
      budget = 1000, rounds = 4)
      .map(r => r._1 -> (r._4, r._5)).toMap
    assert(out("a") == ((10L, true)))
    assert(out("b") == ((50L, true))) // capped only after a's excess moved
    assert(out("c") == ((940L, false)))
  }

  test("waterFill: budget exceeding the corpus caps everything") {
    val out = TokenBudget.waterFill(
      Seq(("a", 10L, 1L), ("b", 20L, 9L)), budget = 1000000, rounds = 4)
    assert(out.forall(_._5))
    assert(out.map(_._4) == Seq(10L, 20L))
  }

  test("waterFill: zero weight and zero budget allocate nothing") {
    val zw = TokenBudget.waterFill(
      Seq(("a", 100L, 0L), ("b", 100L, 5L)), budget = 50, rounds = 4)
      .map(r => r._1 -> r._4).toMap
    assert(zw("a") == 0L && zw("b") == 50L)
    val zb = TokenBudget.waterFill(
      Seq(("a", 100L, 1L)), budget = 0, rounds = 4)
    assert(zb.head._4 == 0L && !zb.head._5)
  }

  test("plan: end-to-end over a toy corpus, rates exact") {
    val docs = Seq(
      ("s1", "one two three"), ("s1", "four five"),
      ("s2", "a b c d e f g h i j")).toDF("source", "text")
    // caps: s1=5, s2=10; weights s1->3, s2->1; budget 8
    val out = TokenBudget.plan(docs, "source", "text",
        Map("s1" -> 3L, "s2" -> 1L), budget = 8)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    // s1 share = 8*3/4 = 6 >= 5 -> capped at 5; s2 gets 8-5=3
    assert(out == List(
      ("s1", 5L, 3L, 5L, 1L, 1000000L),
      ("s2", 10L, 1L, 3L, 0L, 300000L)))
  }
}
