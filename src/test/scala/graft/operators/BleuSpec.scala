package graft.operators

import graft.SparkSpec

class BleuSpec extends SparkSpec {
  import spark.implicits._

  private def report(cand: String, ref: String, maxN: Int) =
    Bleu.bleuReport(Seq((1L, cand, ref)).toDF("doc_id", "cand", "ref"),
      "cand", "ref", maxN).collect().head

  test("hand-computed clipped counts, brevity penalty, final score") {
    // cand "the cat sat" (3 tokens) vs ref "the cat sat on the mat" (6):
    // p1 = p2 = p3 = 1, deficit = ((6-3)*1e6) div 3 = 1e6 -> BLEU = e^-1.
    val r = report("the cat sat", "the cat sat on the mat", maxN = 3)
    assert(r.getAs[Long]("len_c") == 3L && r.getAs[Long]("len_r") == 6L)
    assert(r.getAs[Long]("clipped_1") == 3L && r.getAs[Long]("total_1") == 3L)
    assert(r.getAs[Long]("clipped_2") == 2L && r.getAs[Long]("total_2") == 2L)
    assert(r.getAs[Long]("clipped_3") == 1L && r.getAs[Long]("total_3") == 1L)
    assert(r.getAs[Long]("deficit_micro") == 1000000L)
    assert(r.getAs[Long]("lnp_sum_micro") == 0L)
    assert(r.getAs[Long]("bleu_micro") ==
      math.floor(math.exp(-1.0) * 1e6).toLong)
  }

  test("clipping caps repeated candidate grams at the reference count") {
    val r = report("the the the the", "the cat", maxN = 1)
    assert(r.getAs[Long]("clipped_1") == 1L) // min(4 cand, 1 ref)
    assert(r.getAs[Long]("total_1") == 4L)
    assert(r.getAs[Long]("deficit_micro") == 0L) // c = 4 >= r = 2
    assert(r.getAs[Long]("lnp_sum_micro") ==
      math.floor(math.log(0.25) * 1e6).toLong)
  }

  test("identical texts score exactly 10^6; zero-overlap and empty cases score 0") {
    assert(report("a b c d e", "a b c d e", maxN = 4)
      .getAs[Long]("bleu_micro") == 1000000L)
    // any zero p_n (here: no shared 2-grams) -> NULL lnp sum, bleu 0
    val z = report("x y", "y x", maxN = 2)
    assert(z.isNullAt(z.fieldIndex("lnp_sum_micro")))
    assert(z.getAs[Long]("bleu_micro") == 0L)
    // candidate shorter than n -> total_n = 0 -> bleu 0
    val s = report("a b", "a b", maxN = 3)
    assert(s.getAs[Long]("total_3") == 0L)
    assert(s.getAs[Long]("bleu_micro") == 0L)
    // empty / NULL candidate -> NULL deficit, bleu 0
    val e = report("", "a b", maxN = 1)
    assert(e.isNullAt(e.fieldIndex("deficit_micro")))
    assert(e.getAs[Long]("bleu_micro") == 0L)
  }

  test("zero-shuffle plan: the report is a pure projection") {
    val df = Bleu.bleuReport(
      Seq((1L, "a b c", "a b")).toDF("doc_id", "cand", "ref"),
      "cand", "ref", 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
