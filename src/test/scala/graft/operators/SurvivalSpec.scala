package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fold: the KM recurrence as plain Scala integers. */
  private def ref(subjects: Seq[(Long, Int)]): Seq[(Long, Long, Long, Long, Long)] = {
    val hist = subjects.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, ss) =>
      (t, ss.count(_._2 == 1).toLong, ss.count(_._2 == 0).toLong)
    }
    var atrisk = subjects.size.toLong
    var s = 1000000L
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    for ((t, d, c) <- hist) {
      if (d > 0) {
        s = s * (atrisk - d) / atrisk
        out += ((t, atrisk, d, c, s))
      }
      atrisk -= d + c
    }
    out.toSeq
  }

  test("hand case: textbook small cohort") {
    // durations: events at 1 (2 of 5 at risk), censor at 2, event at 3
    val subjects = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (4L, 0))
    val got = Survival.kaplanMeier(subjects.toDF("dur", "observed"),
      "dur", "observed")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // t=1: s = 1e6*3/5 = 600000; t=3: risk 2 (censor at 2 left), s = 600000*1/2
    assert(got == Seq((1L, 5L, 2L, 0L, 600000L), (3L, 2L, 1L, 0L, 300000L)))
    assert(got == ref(subjects))
  }

  test("differential vs reference fold on random cohorts") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val subjects = (1 to 200 + rnd.nextInt(300)).map(_ =>
        (rnd.nextInt(30).toLong, if (rnd.nextBoolean()) 1 else 0))
      val got = Survival.kaplanMeier(subjects.toDF("dur", "observed"),
        "dur", "observed")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == ref(subjects), s"trial $trial")
    }
  }

  test("survival is non-increasing and censor-only cohorts emit nothing") {
    val rnd = new scala.util.Random(29)
    val subjects = (1 to 400).map(_ =>
      (rnd.nextInt(50).toLong, if (rnd.nextInt(3) == 0) 1 else 0))
    val surv = Survival.kaplanMeier(subjects.toDF("dur", "observed"),
      "dur", "observed")
      .as[(Long, Long, Long, Long, Long)].collect().map(_._5)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a })
    val censOnly = Seq((1L, 0), (5L, 0))
    assert(Survival.kaplanMeier(censOnly.toDF("dur", "observed"),
      "dur", "observed").count() == 0)
  }
}
