package graft.operators

import graft.SparkSpec

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  test("rankMetrics: hand-computed MRR / precision / recall") {
    // q1: relevant docs {10, 30}; ranking hits 10 at rank 2, 30 at 5
    // q2: relevant {99}, never retrieved → zeroed metrics, n_relevant 1
    // q3: no relevant docs at all → zeroed with n_relevant 0
    val ranking = Seq(
      (1, 1L, 11L), (1, 2L, 10L), (1, 3L, 12L), (1, 4L, 13L), (1, 5L, 30L),
      (2, 1L, 11L), (2, 2L, 12L),
      (3, 1L, 11L)).toDF("qid", "rank", "doc_id")
    val rel = Seq((1, 10L), (1, 30L), (2, 99L)).toDF("qid", "doc_id")
    val out = RetrievalEval.rankMetrics(ranking, "qid", "rank", "doc_id",
      rel, "qid", "doc_id", k = 5)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // (n_rel_at_k, first_rel_rank, mrr_ppm, prec_ppm, recall_ppm, n_relevant)
    assert(out(1) == ((2L, 2L, 500000L, 400000L, 1000000L, 2L)))
    assert(out(2) == ((0L, 0L, 0L, 0L, 0L, 1L)))
    assert(out(3) == ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("rankMetrics: rows past k are ignored; perfect ranking scores unit metrics") {
    val ranking = Seq(
      (7, 1L, 1L), (7, 2L, 2L), (7, 3L, 99L)).toDF("qid", "rank", "doc_id")
    val rel = Seq((7, 1L), (7, 2L)).toDF("qid", "doc_id")
    val out = RetrievalEval.rankMetrics(ranking, "qid", "rank", "doc_id",
      rel, "qid", "doc_id", k = 2).collect().head
    assert(out.getLong(1) == 2L && out.getLong(3) == 1000000L &&
      out.getLong(4) == 1000000L && out.getLong(5) == 1000000L)
  }
}
