package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RougeSpec extends SparkSpec {
  import spark.implicits._

  test("rougeN n=1: clipped multiset overlap, not distinct overlap") {
    // cand has 'the' x2, ref 'the' x3 -> clipped contribution 2
    val pairs = Seq(("the cat the hat", "the the the cat sat")).toDF("c", "r")
    val out = Rouge.rougeN(pairs, "c", "r", 1).collect().head
    assert(out.getAs[Long]("overlap_n") == 3L) // the(2) + cat(1)
    assert(out.getAs[Long]("cand_grams") == 4L)
    assert(out.getAs[Long]("ref_grams") == 5L)
    assert(out.getAs[Double]("precision_n") == 3.0 / 4)
    assert(out.getAs[Double]("recall_n") == 3.0 / 5)
  }

  test("rougeN n=2: bigram overlap counts shared adjacent pairs only") {
    val pairs = Seq(("a b c d", "a b x c d")).toDF("c", "r")
    val out = Rouge.rougeN(pairs, "c", "r", 2).collect().head
    // cand bigrams {a b, b c, c d}; ref {a b, b x, x c, c d} -> 2 shared
    assert(out.getAs[Long]("overlap_n") == 2L)
    assert(out.getAs[Long]("cand_grams") == 3L)
    assert(out.getAs[Long]("ref_grams") == 4L)
  }

  test("identical texts score perfect precision and recall") {
    val pairs = Seq(("x y z", "x y z")).toDF("c", "r")
    Seq(1, 2).foreach { n =>
      val out = Rouge.rougeN(pairs, "c", "r", n).collect().head
      assert(out.getAs[Double]("precision_n") == 1.0)
      assert(out.getAs[Double]("recall_n") == 1.0)
    }
  }

  test("degenerate sides: blank candidate and too-short bigram side give NULL scores") {
    val pairs = Seq(("", "a b"), ("a", "a")).toDF("c", "r")
    val u = Rouge.rougeN(pairs, "c", "r", 1).orderBy(length(col("c"))).collect()
    assert(u(0).isNullAt(u(0).fieldIndex("precision_n"))) // empty cand
    assert(u(0).getAs[Long]("overlap_n") == 0L)
    val b = Rouge.rougeN(pairs.filter(col("c") === "a"), "c", "r", 2).collect().head
    assert(b.getAs[Long]("overlap_n") == 0L)
    assert(b.isNullAt(b.fieldIndex("precision_n")))
    assert(b.isNullAt(b.fieldIndex("recall_n")))
  }

  test("NULL text counts as zero grams (no least()-null poisoning)") {
    // without the coalesce guard a NULL ref side scores overlap =
    // |cand grams| because SQL least() SKIPS nulls
    val pairs = Seq((Option("a b c"), Option.empty[String]),
      (Option.empty[String], Option("a b c")),
      (Option.empty[String], Option.empty[String])).toDF("c", "r")
    val rows = Rouge.rougeN(pairs, "c", "r", 1).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("overlap_n") == 0L, "NULL side must clip to 0")
      assert(r.isNullAt(r.fieldIndex("recall_n")) ||
        r.getAs[Double]("recall_n") == 0.0)
    }
    val candNull = rows.find(_.getAs[Long]("cand_grams") == 0L).get
    assert(candNull.isNullAt(candNull.fieldIndex("precision_n")))
  }

  test("matches a driver-side clipped-count replay on random-ish text") {
    val docs = Seq(
      ("q r s t q r", "q r q r s x"),
      ("m n o p", "p o n m"),
      ("u u u", "u u u u u")).toDF("c", "r")
    val got = Rouge.rougeN(docs, "c", "r", 1)
      .select("c", "r", "overlap_n").collect()
    got.foreach { row =>
      val cc = row.getString(0).split("\\s+").groupBy(identity).map { case (k, v) => k -> v.length }
      val rc = row.getString(1).split("\\s+").groupBy(identity).map { case (k, v) => k -> v.length }
      val expect = cc.map { case (g, n) => math.min(n, rc.getOrElse(g, 0)) }.sum
      assert(row.getLong(2) == expect.toLong, s"pair ${row.getString(0)}")
    }
  }

  test("the metric is a pure projection: no exchange in the plan") {
    val pairs = Seq(("a b", "a c")).toDF("c", "r")
    val plan = Rouge.rougeN(pairs, "c", "r", 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
  }
}
