package graft.operators

import graft.SparkSpec

class ChrfSpec extends SparkSpec {
  import spark.implicits._

  private def report(cand: String, ref: String, maxN: Int = 6,
                     beta: Int = 2) =
    Chrf.chrfReport(Seq((1L, cand, ref)).toDF("doc_id", "cand", "ref"),
      "cand", "ref", maxN, beta).collect().head

  /** Scala replica of the exact integer pipeline, for hand cases. */
  private def replica(cand: String, ref: String, maxN: Int, beta: Int)
      : (Option[Long], Option[Long], Long) = {
    def strip(s: String) = s.replaceAll("\\s+", "")
    val (cs, rs) = (strip(cand), strip(ref))
    def grams(s: String, n: Int): Seq[String] =
      if (s.length < n) Seq.empty else (0 to s.length - n).map(i => s.substring(i, i + n))
    def side(own: String, other: String): Option[Long] = {
      val ppms = (1 to maxN).flatMap { n =>
        val g = grams(own, n)
        if (g.isEmpty) None
        else {
          val oc = grams(other, n).groupBy(identity).view.mapValues(_.size).toMap
          val ov = g.groupBy(identity).map { case (k, v) =>
            math.min(v.size, oc.getOrElse(k, 0))
          }.sum
          Some(ov.toLong * 1000000L / g.size)
        }
      }
      if (ppms.isEmpty) None else Some(ppms.sum / ppms.size)
    }
    val (p, r) = (side(cs, rs), side(rs, cs))
    val b2 = beta.toLong * beta
    val f = (p, r) match {
      case (Some(pp), Some(rr)) if pp > 0 || rr > 0 =>
        (1 + b2) * pp * rr / (b2 * pp + rr)
      case _ => 0L
    }
    (p, r, f)
  }

  test("hand-computed counts and exact integer score on 'ab' vs 'abc'") {
    val r = report("ab", "abc", maxN = 2)
    assert(r.getAs[Long]("len_c") == 2L && r.getAs[Long]("len_r") == 3L)
    assert(r.getAs[Long]("ov_1") == 2L && r.getAs[Long]("nc_1") == 2L &&
      r.getAs[Long]("nr_1") == 3L)
    assert(r.getAs[Long]("ov_2") == 1L && r.getAs[Long]("nc_2") == 1L &&
      r.getAs[Long]("nr_2") == 2L)
    // p = (1e6 + 1e6) div 2 = 1e6; r = (666666 + 500000) div 2 = 583333
    assert(r.getAs[Long]("avg_p_ppm") == 1000000L)
    assert(r.getAs[Long]("avg_r_ppm") == 583333L)
    // chrF2 = 5·P·R div (4·P + R) = 2916665000000 div 4583333 = 636363
    assert(r.getAs[Long]("chrf_ppm") == 636363L)
    val (p, rr, f) = replica("ab", "abc", 2, 2)
    assert(p.contains(1000000L) && rr.contains(583333L) && f == 636363L)
  }

  test("identical texts score exactly 10^6; whitespace never counts") {
    assert(report("the cat sat", "the cat sat").getAs[Long]("chrf_ppm")
      == 1000000L)
    // whitespace-stripped equality: different spacing, same characters
    val w = report("a b  c", "abc", maxN = 3)
    assert(w.getAs[Long]("len_c") == 3L && w.getAs[Long]("chrf_ppm") == 1000000L)
  }

  test("orders beyond the text length drop out of the average") {
    // cand 'ab' has no 3..6-grams: only n=1,2 contribute to P.
    val r = report("ab", "abcdef", maxN = 6)
    assert(r.getAs[Long]("nc_3") == 0L && r.getAs[Long]("nc_6") == 0L)
    val (p, rr, f) = replica("ab", "abcdef", 6, 2)
    assert(r.getAs[Long]("avg_p_ppm") == p.get)
    assert(r.getAs[Long]("avg_r_ppm") == rr.get)
    assert(r.getAs[Long]("chrf_ppm") == f)
  }

  test("clipping caps repeated candidate grams at the reference count") {
    val r = report("aaaa", "ab", maxN = 1)
    assert(r.getAs[Long]("ov_1") == 1L) // min(4 cand 'a', 1 ref 'a')
    assert(r.getAs[Long]("avg_p_ppm") == 250000L)
    assert(r.getAs[Long]("avg_r_ppm") == 500000L)
  }

  test("beta weighs recall: beta=2 sits closer to R than beta=1") {
    val r2 = report("ab", "abc", maxN = 2, beta = 2).getAs[Long]("chrf_ppm")
    val r1 = report("ab", "abc", maxN = 2, beta = 1).getAs[Long]("chrf_ppm")
    // here R < P, so the recall-weighted score must be lower
    assert(r2 < r1)
    assert(r1 == replica("ab", "abc", 2, 1)._3)
  }

  test("empty / NULL / zero-overlap cases score exactly 0") {
    val e = report("", "abc")
    assert(e.isNullAt(e.fieldIndex("avg_p_ppm")))
    assert(e.getAs[Long]("chrf_ppm") == 0L)
    val z = report("xyz", "abc")
    assert(z.getAs[Long]("avg_p_ppm") == 0L && z.getAs[Long]("chrf_ppm") == 0L)
    val n = Chrf.chrfReport(
      Seq((1L, null: String, "abc")).toDF("doc_id", "cand", "ref"),
      "cand", "ref").collect().head
    assert(n.getAs[Long]("len_c") == 0L && n.getAs[Long]("chrf_ppm") == 0L)
  }

  test("randomized differential vs the integer replica") {
    val rng = new scala.util.Random(42)
    val alpha = "aab bcc"
    val rows = (1L to 40L).map { i =>
      def mk(len: Int) = (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      (i, mk(rng.nextInt(12)), mk(rng.nextInt(12)))
    }
    val got = Chrf.chrfReport(rows.toDF("doc_id", "cand", "ref"),
      "cand", "ref", maxN = 4, beta = 2)
      .select("doc_id", "avg_p_ppm", "avg_r_ppm", "chrf_ppm")
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { case (i, c, rf) =>
      val (p, r, f) = replica(c, rf, 4, 2)
      assert(got(i) == ((p.getOrElse(-1L), r.getOrElse(-1L), f)),
        s"doc $i: cand='$c' ref='$rf'")
    }
  }

  test("zero-shuffle plan: the report is a pure projection") {
    val df = Chrf.chrfReport(
      Seq((1L, "abc def", "abd ef")).toDF("doc_id", "cand", "ref"),
      "cand", "ref")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
