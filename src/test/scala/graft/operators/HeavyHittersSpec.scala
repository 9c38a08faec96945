package graft.operators

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG guarantee: tokens above n/(k+1) always survive the sketch") {
    val rnd = new scala.util.Random(11)
    // 10_000 tokens: 'hot' 30%, 'warm' 15%, long noise tail
    val stream = (1 to 10000).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "hot" else if (r < 0.45) "warm" else s"noise${rnd.nextInt(3000)}"
    }
    val df = stream.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val top = HeavyHitters.frequentTokens(df, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.head._1 == "hot")
    assert(top(1)._1 == "warm")
    // second pass reports EXACT frequencies
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    top.foreach { case (t, f) => assert(f == exact(t), s"freq mismatch for $t") }
  }

  test("sketch state stays bounded and merges associatively") {
    val mg = new HeavyHitters.MisraGries(5)
    val streamA = Seq.fill(100)("x") ++ (1 to 50).map(i => s"a$i")
    val streamB = Seq.fill(80)("y") ++ (1 to 50).map(i => s"b$i")
    val bufA = streamA.foldLeft(mg.zero)(mg.reduce)
    val bufB = streamB.foldLeft(mg.zero)(mg.reduce)
    assert(bufA.size <= 5 && bufB.size <= 5)
    val merged = mg.merge(bufA, bufB)
    assert(merged.size <= 5)
    assert(merged.contains("x") && merged.contains("y")) // heavy survivors
  }
}
