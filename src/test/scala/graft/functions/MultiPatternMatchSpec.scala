package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MultiPatternMatch

class MultiPatternMatchSpec extends SparkSpec {
  import spark.implicits._

  private def matches(texts: Seq[String], patterns: Seq[String]): Seq[Seq[Int]] =
    texts.toDF("t")
      .select(MultiPatternMatch(col("t"), patterns).as("m"))
      .as[Seq[Int]].collect().toSeq

  test("finds all and only the contained patterns, sorted by index") {
    val got = matches(
      Seq("the quick brown fox", "lazy dog", "quick foxes are brown"),
      Seq("quick", "brown fox", "dog", "cat"))
    assert(got == Seq(Seq(0, 1), Seq(2), Seq(0)))
  }

  test("duplicate patterns each report their own index") {
    assert(matches(Seq("abcabc"), Seq("abc", "abc", "xyz")) == Seq(Seq(0, 1)))
  }

  test("overlapping occurrences and self-overlap") {
    assert(matches(Seq("aaaa"), Seq("aa", "aaa", "aaaaa")) == Seq(Seq(0, 1)))
  }

  test("patterns at the very start and very end match") {
    assert(matches(Seq("startmiddleend"), Seq("start", "end", "middle")) ==
      Seq(Seq(0, 1, 2)))
  }

  test("text shorter than every pattern matches nothing; null is null") {
    assert(matches(Seq("ab"), Seq("abc", "abcd")) == Seq(Seq.empty))
    val got = Seq(Some("abc"), None).toDF("t")
      .select(MultiPatternMatch(col("t"), Seq("b")).as("m"))
      .as[Option[Seq[Int]]].collect().toSeq
    assert(got == Seq(Some(Seq(0)), None))
  }

  test("empty pattern set and empty patterns are rejected") {
    intercept[IllegalArgumentException] { MultiPatternMatch(col("t"), Seq.empty) }
    intercept[IllegalArgumentException] { MultiPatternMatch(col("t"), Seq("a", "")) }
  }

  test("differential vs naive contains on randomized input") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val texts = (1 to 300).map(_ => randStr(5 + rnd.nextInt(60)))
    // small alphabet + short patterns -> plenty of hash-band collisions
    val patterns = (1 to 20).map(_ => randStr(1 + rnd.nextInt(6))).distinct
    val expected = texts.map(t =>
      patterns.zipWithIndex.collect { case (p, i) if t.contains(p) => i })
    assert(matches(texts, patterns) == expected)
  }

  test("unicode text (multi-byte, surrogate pairs) matches correctly") {
    val got = matches(
      Seq("café 😀 bar", "plain"),
      Seq("café", "😀", "afé \ud83d"))
    assert(got == Seq(Seq(0, 1, 2), Seq.empty))
  }
}
