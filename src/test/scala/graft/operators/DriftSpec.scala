package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(term: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  test("psiByBucket: identical snapshots score ~zero everywhere") {
    val a = Seq("spark table join", "window sort").toDF("text")
    val out = Drift.psiByBucket(a, a, "text", buckets = 32).collect()
    assert(out.nonEmpty)
    // identical distributions: pb == pc exactly → contribution floor(−0·…)=0
    assert(out.forall(_.getLong(3) == 0L), "identical snapshots must score 0")
  }

  test("psiByBucket: exact quantized contributions vs independent replay") {
    val b = 16
    val base = Seq("aa aa bb", "cc").toDF("text")
    val cur = Seq("aa dd dd dd").toDF("text")
    val out = Drift.psiByBucket(base, cur, "text", buckets = b)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val bT = Seq("aa", "aa", "bb", "cc").map(t => bucket(t, b))
    val cT = Seq("aa", "dd", "dd", "dd").map(t => bucket(t, b))
    val allBuckets = (bT ++ cT).distinct
    allBuckets.foreach { f =>
      val cb = bT.count(_ == f).toLong; val cc = cT.count(_ == f).toLong
      val pb = (cb + 1.0) / (4 + b.toDouble)
      val pc = (cc + 1.0) / (4 + b.toDouble)
      val want = math.floor((pb - pc) * math.log(pb / pc) * 1e9).toLong
      val got = out(f)
      assert((got._1, got._2) == (cb, cc), s"counts for bucket $f")
      assert(got._3 == want, s"psi_q for bucket $f: got ${got._3}, want $want")
    }
    // drifted corpus: total PSI strictly positive
    assert(out.values.map(_._3).sum > 0L)
  }

  test("psiByBucket: a token only in one side still gets a finite score") {
    val base = Seq("only-here").toDF("text")
    val cur = Seq("only-there").toDF("text")
    val out = Drift.psiByBucket(base, cur, "text", buckets = 8).collect()
    assert(out.forall(r => !r.isNullAt(3)), "smoothing must prevent ln(0)")
  }
}
