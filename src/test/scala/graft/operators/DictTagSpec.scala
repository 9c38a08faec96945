package graft.operators

import graft.SparkSpec

class DictTagSpec extends SparkSpec {
  import spark.implicits._

  private def tags(rows: Seq[(Long, String)], kws: Seq[String]) =
    DictTag.tagCounts(rows.toDF("id", "text"), "id", "text", kws)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("overlapping occurrences count at every start position") {
    // "aaa" contains "aa" at positions 0 and 1
    assert(tags(Seq((1L, "aaa")), Seq("aa", "b")) == Set((1L, "aa", 2L)))
  }

  test("mixed lengths and same-length patterns tag independently") {
    val out = tags(Seq(
      (1L, "the table scan beats a hash join"),
      (2L, "no keywords here"),
      (3L, "table scan table scan")),
      Seq("table scan", "hash join", "scan"))
    assert(out == Set(
      (1L, "table scan", 1L), (1L, "hash join", 1L), (1L, "scan", 1L),
      (3L, "table scan", 2L), (3L, "scan", 2L)))
  }

  test("null text yields no rows; empty dictionary and dupes fail loudly") {
    val withNull = Seq((1L, "table scan"), (2L, null.asInstanceOf[String]))
    assert(tags(withNull, Seq("table scan")) == Set((1L, "table scan", 1L)))
    intercept[IllegalArgumentException] {
      DictTag.tagCounts(withNull.toDF("id", "text"), "id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DictTag.tagCounts(withNull.toDF("id", "text"), "id", "text",
        Seq("x", "x"))
    }
  }

  test("differential vs naive per-position counting on random ab-strings") {
    val rnd = new scala.util.Random(11)
    val kws = Seq("ab", "aba", "bb", "aab")
    val rows = (1L to 60L).map(i =>
      (i, (1 to 20).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString))
    def naive(text: String, p: String): Long =
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    val expect = (for {
      (id, text) <- rows; k <- kws
      c = naive(text, k) if c > 0
    } yield (id, k, c)).toSet
    assert(tags(rows, kws) == expect)
  }
}
