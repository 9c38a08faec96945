package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FeatureHash

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16

  private def vec(text: String): Seq[Long] =
    Seq(Tuple1(text)).toDF("t")
      .select(FeatureHash(col("t"), Dim, 7, 8).as("v"))
      .collect().head.getSeq[Long](0)

  /** Driver replica of the portable hash (md5 first 8 hex as long). */
  private def h32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  private def replica(text: String): Seq[Long] = {
    val v = new Array[Long](Dim)
    text.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
      val b = (h32(s"7:$t") % Dim).toInt
      v(b) += (if (h32(s"8:$t") % 2 == 0) 1L else -1L)
    }
    v.toSeq
  }

  test("single token lands in its md5 bucket with its md5 sign") {
    val t = "hello"
    val b = (h32(s"7:$t") % Dim).toInt
    val sgn = if (h32(s"8:$t") % 2 == 0) 1L else -1L
    val v = vec(t)
    assert(v(b) == sgn && v.map(math.abs).sum == 1L)
  }

  test("repeated token accumulates; vector length is always dim") {
    val v = vec("w w w")
    assert(v.length == Dim && v.map(math.abs).sum == 3L)
    assert(v.count(_ != 0L) == 1)
  }

  test("differential vs driver replica on varied docs") {
    val cases = Seq("the quick brown fox", "a a b b c", "  padded   text  ",
      "one", "x y z w v u t s r q p o n m l k j i h g f e d c b a")
    cases.foreach(c => assert(vec(c) == replica(c), s"mismatch on '$c'"))
  }

  test("empty and blank give the zero vector; null gives null") {
    assert(vec("") == Seq.fill(Dim)(0L))
    assert(vec("   ") == Seq.fill(Dim)(0L))
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(FeatureHash(col("t"), Dim, 7, 8)).collect().head
    assert(r.isNullAt(0))
  }

  test("compiled and interpreted paths agree") {
    val df = Seq("alpha beta gamma", "beta beta", "gamma delta epsilon")
      .toDF("t").select(FeatureHash(col("t"), Dim, 7, 8).as("v"))
    val on = df.collect().map(_.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.collect().map(_.getSeq[Long](0)).toSeq == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("L1 mass equals token count when no in-bucket cancellation occurs") {
    // distinct tokens may collide in a bucket with opposite signs; a
    // single repeated token cannot cancel itself
    val v = vec("tok tok tok tok tok")
    assert(v.map(math.abs).sum == 5L)
  }
}
