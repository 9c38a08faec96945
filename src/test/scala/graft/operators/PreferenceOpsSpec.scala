package graft.operators

import graft.SparkSpec

class PreferenceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: a dominance chain orders ratings strictly") {
    // A beats B 9-1, B beats C 9-1, A beats C 10-0
    val rows =
      Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
        Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
        Seq.fill(10)(("A", "C"))
    val out = PreferenceOps.bradleyTerry(rows.toDF("w", "l"), "w", "l")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out("A") > out("B") && out("B") > out("C"))
    assert(out("A") == 1000000L) // max-normalized winner
  }

  test("bradleyTerry: symmetric records tie exactly") {
    val rows = Seq(("A", "B"), ("B", "A"), ("A", "B"), ("B", "A"))
    val out = PreferenceOps.bradleyTerry(rows.toDF("w", "l"), "w", "l")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._2).distinct.length == 1) // identical ratings
    assert(out.forall(r => r._3 == 2 && r._4 == 4)) // wins=2, games=4
  }

  test("bradleyTerry ≡ the integer MM recurrence replayed in Scala") {
    val rnd = new scala.util.Random(17)
    val players = (0 until 8).map(i => s"p$i")
    val rows = (1 to 400).map { _ =>
      val i = rnd.nextInt(8); var j = rnd.nextInt(8)
      while (j == i) j = rnd.nextInt(8)
      // lower index wins with prob ~ 0.7
      if (rnd.nextDouble() < 0.7) (players(math.min(i, j)), players(math.max(i, j)))
      else (players(math.max(i, j)), players(math.min(i, j)))
    }
    val iters = 5
    val got = PreferenceOps.bradleyTerry(rows.toDF("w", "l"), "w", "l", iters)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap

    // reference: same fixed-point arithmetic with BigInt
    val S = BigInt(1000000); val K = BigInt("1000000000000")
    val pairs = rows.map { case (w, l) =>
      (Seq(w, l).min, Seq(w, l).max, w < l)
    }.groupBy(t => (t._1, t._2)).map { case ((a, b), g) =>
      (a, b, BigInt(g.size), BigInt(g.count(_._3)))
    }.toSeq
    val wins = players.map { p =>
      p -> pairs.collect {
        case (a, b, n, wa) if a == p => wa
        case (a, b, n, wa) if b == p => n - wa
      }.sum
    }.toMap
    var r = players.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val d = players.map { p =>
        p -> pairs.collect {
          case (a, b, n, _) if a == p || b == p => n * K / (r(a) + r(b))
        }.sum
      }.toMap
      val raw = players.filter(d(_) > 0)
        .map(p => p -> ((wins(p) * K / d(p)) max BigInt(1))).toMap
      val mx = raw.values.max
      r = raw.map { case (p, v) => p -> v * S / mx }
    }
    players.filter(got.contains).foreach { p =>
      assert(got(p) == r(p).toLong, s"player $p")
    }
  }

  test("bradleyTerry: a never-winner floors at epsilon, never divides by zero") {
    val rows = Seq(("A", "Z"), ("B", "Z"), ("A", "Z"), ("B", "Z"), ("A", "B"), ("B", "A"))
    val out = PreferenceOps.bradleyTerry(rows.toDF("w", "l"), "w", "l", 6)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out("Z") >= 1L && out("Z") < out("A") && out("Z") < out("B"))
  }

  test("bradleyTerry: self-matches and nulls are dropped") {
    val rows = Seq(Some("A") -> Some("B"), Some("A") -> Some("A"),
      None -> Some("B"), Some("B") -> None)
    val out = PreferenceOps.bradleyTerry(rows.toDF("w", "l"), "w", "l")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set("A", "B"))
    assert(out.map(_._4).sum == 2) // one counted game, both sides
  }
}
