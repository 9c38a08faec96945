package graft.operators

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("eceBins: perfectly calibrated bins gap to zero") {
    // bin 5: two rows at conf 0.5, one positive -> mean conf = pos rate
    val df = Seq((500000L, 1L), (500000L, 0L)).toDF("conf", "y")
    val r = Calibration.eceBins(df, "conf", "y").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 5 && row.getLong(4) == 0 && row.getLong(5) == 0)
  }

  test("eceBins: hand case — gaps, bin clamp at conf=10^6, exact ECE") {
    val df = Seq(
      (900000L, 0L),   // bin 9: gap 900000
      (1000000L, 1L),  // conf exactly 1.0 clamps into bin 9: gap 0
      (100000L, 0L),   // bin 1: gap 100000
      (100000L, 0L))   // bin 1 again
      .toDF("conf", "y")
    val out = Calibration.eceBins(df, "conf", "y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    val byBin = out.map(r => r._1 -> r).toMap
    assert(byBin.keySet == Set(1L, 9L))
    val b1 = byBin(1L); val b9 = byBin(9L)
    assert(b1._2 == 2 && b1._3 == 100000 && b1._4 == 0 && b1._5 == 100000)
    // bin 9: sum conf 1.9e6, pos 1 -> |1900000 - 1000000| / 2 = 450000
    assert(b9._2 == 2 && b9._5 == 450000)
    // ECE = (200000 + 900000) / 4 = 275000, telescoped exactly
    assert(out.forall(_._6 == 275000))
  }

  test("eceBins ≡ double reference on random data; partition-invariant") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 5000).map { _ =>
      val c = rnd.nextInt(1000001).toLong
      val y = if (rnd.nextDouble() * 1e6 < c * 0.8) 1L else 0L
      (c, y)
    }
    val df = rows.toDF("conf", "y")
    val a = Calibration.eceBins(df, "conf", "y").collect().map(_.toString)
    val b = Calibration.eceBins(df.repartition(13), "conf", "y")
      .collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    // double reference for ECE
    val byBin = rows.groupBy { case (c, _) => math.min(c * 10 / 1000000, 9) }
    val ece = byBin.values.map { g =>
      math.abs(g.map(_._1).sum - 1000000.0 * g.map(_._2).sum)
    }.sum / rows.size
    val got = Calibration.eceBins(df, "conf", "y").collect().head.getLong(5)
    assert(math.abs(got - ece) <= 1.0)
  }

  test("eceBins: nulls dropped; single bin count") {
    val df = Seq((Some(250000L), Some(1L)), (None, Some(0L)),
      (Some(250000L), None)).toDF("conf", "y")
    val r = Calibration.eceBins(df, "conf", "y").collect()
    assert(r.length == 1 && r.head.getLong(1) == 1)
  }
}
