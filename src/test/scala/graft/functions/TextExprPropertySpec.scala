package graft.functions

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import graft.SparkSpec
import graft.functions.TextFunctions._

/** Randomized differential testing of the compiled text expressions
  * against their interpreted HOF references — the contract every DuckDB
  * oracle depends on. Strings mix unicode, every whitespace class, and
  * pathological shapes (leading tabs, all-space, empty). Rows are
  * evaluated in ONE local-relation batch per property case to keep the
  * suite fast. */
class TextExprPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Run a scalacheck property under ScalaTest (the scalatest-plus
    * bridge isn't in the offline cache; the raw runner is enough). */
  private def check(prop: Prop, minSuccessful: Int = 20): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(minSuccessful),
      prop)
    assert(res.passed, res.status.toString)
  }

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("ünïcode", "töken", "日本語", "a-b.c", "x,y;z", "123", "", "#!?"),
    Gen.listOfN(3, Gen.asciiPrintableChar).map(_.mkString))

  private val sep: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "  ", "\t", "\n", "\r", " \t ")).map(_.mkString).map(_.take(4))

  private val text: Gen[String] = for {
    pre <- Gen.oneOf("", " ", "\t", "  ")
    toks <- Gen.listOfN(8, token)
    seps <- Gen.listOfN(8, sep)
    post <- Gen.oneOf("", " ", "\n")
  } yield pre + toks.zip(seps).map { case (t, s) => t + s }.mkString + post

  private def batch(texts: Seq[String]) = texts.toDF("t")

  test("wordShingles ≡ HOF on random text (k ∈ 1..4)") {
    check(forAll(Gen.listOfN(24, text), Gen.choose(1, 4)) { (texts, k) =>
      val df = batch(texts)
      val got = df.select(wordShingles($"t", k)).as[Seq[String]].collect().toSeq
      val ref = df.select(wordShinglesHof($"t", k)).as[Seq[String]].collect().toSeq
      Prop(got == ref) :| s"k=$k texts=${texts.take(3)}..."
    })
  }

  test("simhash32 ≡ HOF on random text") {
    check(forAll(Gen.listOfN(24, text)) { texts =>
      val df = batch(texts)
      val got = df.select(simhash32($"t")).as[Long].collect().toSeq
      val ref = df.select(simhash32Hof($"t")).as[Long].collect().toSeq
      Prop(got == ref) :| texts.take(3).toString
    })
  }

  test("minhashSignature ≡ HOF on random shingle sets") {
    check(forAll(Gen.listOfN(24, text), Gen.choose(2, 8)) { (texts, n) =>
      val df = batch(texts)
      def read(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0)).toSeq
      val got = read(df.select(minhashSignature(wordShingles($"t", 2), n)).collect())
      val ref = read(df.select(minhashSignatureHof(wordShingles($"t", 2), n)).collect())
      Prop(got == ref) :| s"n=$n"
    })
  }
}
