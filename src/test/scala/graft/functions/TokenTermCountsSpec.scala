package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenTermCounts
import graft.SparkSpec

class TokenTermCountsSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("the", "cat", "join")

  test("differential vs the HOF per-term formulation") {
    val docs = Seq(
      "the cat sat on the the mat",
      "  join the   hash join ",
      "nothing matches here",
      "",
      "   ",
      "cat").toDF("text")
    val ts = TextFunctions.tokens(col("text"))
    val hof = terms.map(t => size(filter(ts, x => x === lit(t))).cast("long")) :+
      size(ts).cast("long")
    val got = docs.select(TokenTermCounts(col("text"), terms).as("c"),
      array(hof: _*).as("e")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"counts ${r.getSeq[Long](0)} vs HOF ${r.getSeq[Long](1)}")
    }
  }

  test("null text yields null, not zeros") {
    val out = Seq[Option[String]](None, Some("the"))
      .toDF("text").select(TokenTermCounts(col("text"), terms).as("c")).collect()
    assert(out.exists(_.isNullAt(0)) && out.exists(!_.isNullAt(0)))
  }

  test("duplicate terms count into the first slot only") {
    val out = Seq("a a b").toDF("text")
      .select(TokenTermCounts(col("text"), Seq("a", "a", "b")).as("c"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(2L, 0L, 1L, 3L))
  }

  test("survives two instances in one codegen context") {
    val out = Seq("x y x").toDF("text")
      .select(TokenTermCounts(col("text"), Seq("x")).as("a"),
        TokenTermCounts(col("text"), Seq("y")).as("b"))
      .collect().head
    assert(out.getSeq[Long](0) == Seq(2L, 3L))
    assert(out.getSeq[Long](1) == Seq(1L, 3L))
  }
}
