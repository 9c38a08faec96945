package graft.operators

import graft.SparkSpec

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private def enc(rows: Seq[(Long, String, Long)], m: Long = 20L) =
    Encoding.targetEncodeLoo(rows.toDF("id", "cat", "y"), "id", "cat", "y", m)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("leave-one-out excludes the own row, smoothing pulls to the prior") {
    // cat a: y = (10, 20, 30); global prior = floor(120/4) = 30
    // with m = 1: enc(10) = (50 + 30) / 3 = 26 (int), enc(20) = (40+30)/3 = 23
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 60L))
    val out = enc(rows, m = 1L)
    assert(out(1L) == 26L && out(2L) == 23L && out(3L) == 20L)
    // singleton b: own row excluded → pure prior
    assert(out(4L) == 30L)
  }

  test("identical targets encode to the target itself at any smoothing") {
    val rows = (1L to 10L).map(i => (i, "a", 500L))
    assert(enc(rows, m = 20L).values.toSet == Set(500L))
  }

  test("negative targets floor toward -inf consistently") {
    // prior = floor(-10/2) = -5; singleton cats with m = 2:
    // enc = floor((-y_other? no: own cat only) ...) — for id 1 (cat a,
    // y=-7): (0 - ... ) cat sum −7, LOO numerator = (−7 −(−7)) + 2·(−5)
    // = −10, denominator = 0 + 2 → −5
    val out = enc(Seq((1L, "a", -7L), (2L, "b", -3L)), m = 2L)
    assert(out(1L) == -5L && out(2L) == -5L)
  }

  test("high-cardinality stays a join: partitioning invariance") {
    val rnd = new scala.util.Random(4)
    val rows = (1L to 500L).map(i =>
      (i, s"c${rnd.nextInt(80)}", rnd.nextInt(2000).toLong - 500L))
    val one = enc(rows)
    val many = Encoding.targetEncodeLoo(
      rows.toDF("id", "cat", "y").repartition(17), "id", "cat", "y", 20L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(one == many)
  }
}
