package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CharEntropy

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def ent(text: String): Row =
    Seq(Tuple1(text)).toDF("t")
      .select(CharEntropy(col("t")).as("e"))
      .select("e.n_chars", "e.distinct_chars", "e.entropy_unano")
      .collect().head

  /** Boxed reference implementation of the same quantized pipeline. */
  private def replica(text: String): (Long, Long, Long) = {
    val cps = text.codePoints().toArray.toSeq
    val n = cps.size.toLong
    if (n == 0L) return (0L, 0L, 0L)
    val counts = cps.groupBy(identity).view.mapValues(_.size.toLong)
    val s = counts.values.map(k => k * CharEntropy.lnq(k)).sum
    (n, counts.size.toLong, math.max(0L, n * CharEntropy.lnq(n) - s) / n)
  }

  test("single repeated character has exactly zero entropy") {
    assert(ent("aaaaaaaa") == Row(8L, 1L, 0L))
  }

  test("two balanced characters give quantized ln 2") {
    // n=4, counts {a:2, b:2}: num = 4·lnq(4) − 4·lnq(2)
    //   = 4·1386294 − 4·693147 = 2772588; div 4 = 693147 = lnq(2)
    assert(ent("abab") == Row(4L, 2L, 693147L))
  }

  test("all-distinct text gives quantized ln n") {
    // counts all 1 → lnq(1)=0 → H = lnq(n)
    assert(ent("abcd") == Row(4L, 4L, CharEntropy.lnq(4)))
  }

  test("empty is (0,0,0); null is null; code points counted, not UTF-16 units") {
    assert(ent("") == Row(0L, 0L, 0L))
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(CharEntropy(col("t")).as("e")).collect().head
    assert(r.isNullAt(0))
    // U+1D11E (musical G clef) is one code point, two UTF-16 units
    assert(ent("𝄞" * 3) == Row(3L, 1L, 0L))
  }

  test("differential vs boxed replica on varied strings, compiled and interpreted") {
    val cases = Seq("hello world", "zzzzzzzzzzzzzzzzzzzzzz", "the quick brown fox",
      "aabbccddeeff gg hh", "x", "ab", "mississippi" * 7,
      (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    for (c <- cases) {
      val (n, d, e) = replica(c)
      assert(ent(c) == Row(n, d, e), s"mismatch on '$c'")
    }
    // whole-stage codegen ON vs OFF agree (exercises both eval paths)
    val df = cases.toDF("t").select(CharEntropy(col("t")).as("e"))
    val on = df.collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.collect().toSeq == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("entropy is non-negative and bounded by lnq(n) on random-ish input") {
    val texts = (1 to 50).map(i =>
      new scala.util.Random(i).alphanumeric.take(20 + i).mkString)
    val rows = texts.map(Tuple1(_)).toDF("t")
      .select(CharEntropy(col("t")).as("e"))
      .select("e.n_chars", "e.entropy_unano").collect()
    rows.foreach { r =>
      val (n, e) = (r.getLong(0), r.getLong(1))
      assert(e >= 0L && e <= CharEntropy.lnq(n))
    }
  }
}
