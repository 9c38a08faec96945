package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // independent reference: same md5-based bucket hash as TextFunctions
  private def bucket(term: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % b
  }
  private def q(x: Double): Long = math.floor(x * 1e6).toLong

  private val train = Seq(
    (1L, "tech", "spark cluster shuffle spark executor"),
    (2L, "tech", "cluster codegen plan"),
    (3L, "food", "bread olive bread salt"),
    (4L, "food", "olive oven salt flour"),
    (5L, "food", "flour oven yeast")).toDF("doc_id", "label", "text")

  private val toScore = Seq(
    (10L, "spark plan shuffle"),
    (11L, "bread flour salt"),
    (12L, "oven cluster"), // mixed
    (13L, "   ")           // token-less
  ).toDF("doc_id", "text")

  /** Full driver-side replay of trainScore's documented math. */
  private def reference(b: Int): Map[Long, (String, Long)] = {
    val tr = Seq(
      ("tech", "spark cluster shuffle spark executor"),
      ("tech", "cluster codegen plan"),
      ("food", "bread olive bread salt"),
      ("food", "olive oven salt flour"),
      ("food", "flour oven yeast"))
    val toks = tr.flatMap { case (c, s) => s.split("\\s+").map(w => (c, bucket(w, b))) }
    val cnt = toks.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val tot = toks.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    val nd = tr.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    val ndT = nd.values.sum
    val prior = nd.map { case (c, n) => c -> q(math.log(n.toDouble) - math.log(ndT.toDouble)) }
    def lq(c: String, f: Long): Long =
      q(math.log(cnt.getOrElse((c, f), 0L) + 1.0) - math.log(tot(c) + b.toDouble))
    val classes = nd.keys.toSeq.sorted
    val default = prior.toSeq.minBy { case (c, p) => (-p, c) }
    Seq((10L, "spark plan shuffle"), (11L, "bread flour salt"),
      (12L, "oven cluster"), (13L, "   ")).map { case (id, s) =>
      val tf = s.trim.split("\\s+").filter(_.nonEmpty)
        .map(bucket(_, b)).groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
      if (tf.isEmpty) id -> default
      else {
        val scored = classes.map(c => c -> (prior(c) + tf.map { case (f, n) => n * lq(c, f) }.sum))
        id -> scored.minBy { case (c, s0) => (-s0, c) }
      }
    }.toMap
  }

  test("trainScore matches the independent replay bucket-for-bucket") {
    val b = 64
    val out = NbClassifier.trainScore(train, toScore, "doc_id", "text", "label", buckets = b)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out === reference(b))
  }

  test("predictions recover the planted classes; token-less doc gets the best prior") {
    val out = NbClassifier.trainScore(train, toScore, "doc_id", "text", "label", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) === "tech")
    assert(out(11L) === "food")
    // food has 3 of 5 training docs -> the larger prior
    assert(out(13L) === "food")
  }

  test("equal priors: token-less default tie-breaks to the smaller class string") {
    val tied = Seq((1L, "alpha beta", "zz"), (2L, "gamma delta", "aa"))
      .toDF("doc_id", "text", "label")
    val out = NbClassifier.trainScore(tied, Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text", "label", buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(9L) === "aa")
  }

  test("null labels are excluded from training; empty training set is loud") {
    val withNull = train.unionByName(
      Seq((6L, "noise noise", null.asInstanceOf[String])).toDF("doc_id", "text", "label"))
    val out = NbClassifier.trainScore(withNull, toScore, "doc_id", "text", "label", buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out === reference(64)) // identical: the null-label row contributed nothing
    val ex = intercept[IllegalArgumentException] {
      NbClassifier.trainScore(train.where(lit(false)), toScore,
        "doc_id", "text", "label", buckets = 64)
    }
    assert(ex.getMessage.contains("no labelled training rows"))
    val ex2 = intercept[IllegalArgumentException] {
      NbClassifier.trainScore(train, toScore, "doc_id", "text", "label",
        buckets = 30000000)
    }
    assert(ex2.getMessage.contains("broadcast-model budget"))
  }

  test("separates planted keyword-stuffed spam that gopherFlags passes") {
    // Spam that sails through every Gopher heuristic: >=50 tokens, mean
    // token length in [3,10], no digits, a few stopwords for the ratio —
    // but a token DISTRIBUTION (commercial keyword stuffing) unlike the
    // editorial class. A supervised scorer sees the distribution.
    val stop = "the for you and with"
    val spamBody = ("buy cheap discount deal offer price sale shop order best " +
      "coupon bargain promo clearance savings voucher bonus free gift win ") * 3
    def spam(i: Long) = (i, s"$stop $spamBody $stop", "spam")
    val prose = ("the committee reviewed the annual report and noted that " +
      "membership grew while costs were contained through careful planning " +
      "volunteers organised events for the community across the year ") * 2
    def good(i: Long) = (i, prose + s" chapter $i", "good")

    val labelled = (Seq(1L, 2L, 3L).map(spam) ++ Seq(4L, 5L, 6L).map(good))
      .toDF("doc_id", "text", "label")
    val heldOut = Seq(
      (20L, s"$stop grab this exclusive coupon deal cheap price free bonus " +
        s"gift voucher sale promo discount order shop win best offer " +
        s"clearance savings bargain buy now $spamBody"),
      (21L, prose + " members praised the careful planning of the events"))
      .toDF("doc_id", "text")

    // gopherFlags misses the spam: every heuristic passes
    val gf = graft.operators.QualityOps.gopherFlags(heldOut, "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("pass"))).toMap
    assert(gf(20L), "planted spam should pass the Gopher heuristics")
    assert(gf(21L))

    // ...but the trained scorer separates it
    val nb = NbClassifier.trainScore(labelled, heldOut, "doc_id", "text", "label",
      buckets = 512).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nb(20L) === "spam")
    assert(nb(21L) === "good")
  }
}
