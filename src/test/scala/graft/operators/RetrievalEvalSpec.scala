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

  test("ndcgAtK: hand-computed DCG/IDCG; perfect ranking scores ndcg 1") {
    val d = RetrievalEval.ndcgDiscountsNano(5)
    assert(d.head == 1000000000L) // log2(2) = 1
    assert(d == d.sorted.reverse) // monotone decreasing
    // q1: grades — doc 10 -> 3, doc 30 -> 1; ranking: 10 at rank 2, 30 at 5.
    // q2: graded doc never retrieved -> dcg 0, idcg > 0, ndcg 0.
    // q3: no graded docs -> all zero.
    val ranking = Seq(
      (1, 1L, 11L), (1, 2L, 10L), (1, 3L, 12L), (1, 4L, 13L), (1, 5L, 30L),
      (2, 1L, 11L),
      (3, 1L, 11L)).toDF("qid", "rank", "doc_id")
    val rel = Seq((1, 10L, 3L), (1, 30L, 1L), (2, 99L, 2L))
      .toDF("qid", "doc_id", "grade")
    val out = RetrievalEval.ndcgAtK(ranking, "qid", "rank", "doc_id",
      rel, "qid", "doc_id", "grade", k = 5)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val dcg1 = 3L * d(1) + 1L * d(4)        // hits at ranks 2 and 5
    val idcg1 = 3L * d(0) + 1L * d(1)       // ideal: 3 then 1
    assert(out(1) == ((2L, dcg1, idcg1, dcg1 * 1000000L / idcg1)))
    assert(out(2) == ((1L, 0L, 2L * d(0), 0L)))
    assert(out(3) == ((0L, 0L, 0L, 0L)))
    // perfect ordering of all graded docs -> ndcg exactly 10^6
    val perfect = Seq((9, 1L, 10L), (9, 2L, 30L)).toDF("qid", "rank", "doc_id")
    val rel9 = Seq((9, 10L, 3L), (9, 30L, 1L)).toDF("qid", "doc_id", "grade")
    val p = RetrievalEval.ndcgAtK(perfect, "qid", "rank", "doc_id",
      rel9, "qid", "doc_id", "grade", k = 5).collect().head
    assert(p.getLong(4) == 1000000L)
  }

  test("ndcgAtK: ideal side caps at k — extra graded docs beyond k don't inflate idcg") {
    val d = RetrievalEval.ndcgDiscountsNano(2)
    val ranking = Seq((1, 1L, 1L), (1, 2L, 2L)).toDF("qid", "rank", "doc_id")
    val rel = Seq((1, 1L, 2L), (1, 2L, 2L), (1, 3L, 2L))
      .toDF("qid", "doc_id", "grade") // 3 graded docs, k = 2
    val out = RetrievalEval.ndcgAtK(ranking, "qid", "rank", "doc_id",
      rel, "qid", "doc_id", "grade", k = 2).collect().head
    assert(out.getLong(1) == 3L)                       // n_graded uncapped
    assert(out.getLong(3) == 2L * d(0) + 2L * d(1))    // idcg capped at k
    assert(out.getLong(4) == 1000000L)                 // retrieved 2 of the 3 equals ideal
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
