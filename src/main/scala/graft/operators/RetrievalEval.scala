package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over a ranked result table — the
  * numbers a search/RAG pipeline gates deployments on. Given a ranking
  * (query, rank, doc) and a relevance set (query, doc), emits per-query
  * MRR, precision@k and recall@k as EXACT ppm integers (reciprocal
  * ranks and count ratios are rationals; no float, no log-discount
  * metric here by design — nDCG's log₂ weights would reintroduce
  * cross-engine float edges for little extra signal over MRR+P/R).
  *
  * Scale shape: the ranking table is already top-k-per-query sized
  * (queries·k rows); one equi-join against the relevance set on
  * (query, doc), one per-query aggregate, one join for the relevant-set
  * sizes — nothing corpus-sized moves. Queries with zero relevant
  * results surface with zeroed metrics, not dropped rows (a silent
  * drop is how broken retrieval hides).
  */
object RetrievalEval {

  /** Per-query metric table: `qid, n_rel_at_k, first_rel_rank
    * (0 = none), mrr_ppm, prec_at_k_ppm, recall_at_k_ppm, n_relevant`,
    * ordered by qid. `ranking` must carry 1-based ranks; rows with
    * rank > k are ignored. */
  def rankMetrics(ranking: DataFrame, qidCol: String, rankCol: String,
                  docCol: String, relevance: DataFrame, relQidCol: String,
                  relDocCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val rel = relevance.select(col(relQidCol).as("qid"), col(relDocCol).as("doc"))
    val relSizes = rel.groupBy("qid").agg(count(lit(1)).as("n_relevant"))
    val hits = ranking
      .select(col(qidCol).as("qid"), col(rankCol).cast("long").as("rank"),
        col(docCol).as("doc"))
      .filter(col("rank") <= k)
      .join(rel, Seq("qid", "doc"), "left_semi")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_rel_at_k"),
        min("rank").as("first_rel_rank"))
    ranking.select(col(qidCol).as("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .join(relSizes, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_rel_at_k"), lit(0L)).as("n_rel_at_k"),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        when(col("first_rel_rank").isNull, lit(0L))
          .otherwise(expr("1000000L div first_rel_rank")).as("mrr_ppm"),
        expr(s"(coalesce(n_rel_at_k, 0L) * 1000000) div $k").as("prec_at_k_ppm"),
        when(coalesce(col("n_relevant"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(coalesce(n_rel_at_k, 0L) * 1000000) div n_relevant"))
          .as("recall_at_k_ppm"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"))
      .orderBy("qid")
  }

  /** DuckDB replica: `rankedSql` must yield (qid, rank, doc_id) and
    * `relSql` (qid, doc_id). */
  def rankMetricsOracleSql(rankedSql: String, relSql: String, k: Int): String =
    s"""WITH ranked AS (SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id
       |                FROM ($rankedSql) WHERE rank <= $k),
       |rel AS (SELECT qid, doc_id FROM ($relSql)),
       |sizes AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_relevant
       |          FROM rel GROUP BY qid),
       |hits AS (SELECT r.qid, CAST(count(*) AS BIGINT) AS n_rel_at_k,
       |                min(r.rank) AS first_rel_rank
       |         FROM ranked r JOIN rel USING (qid, doc_id) GROUP BY r.qid)
       |SELECT q.qid,
       |  CAST(COALESCE(h.n_rel_at_k, 0) AS BIGINT) AS n_rel_at_k,
       |  CAST(COALESCE(h.first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
       |  CAST(CASE WHEN h.first_rel_rank IS NULL THEN 0
       |       ELSE 1000000 // h.first_rel_rank END AS BIGINT) AS mrr_ppm,
       |  CAST((COALESCE(h.n_rel_at_k, 0) * 1000000) // $k AS BIGINT)
       |    AS prec_at_k_ppm,
       |  CAST(CASE WHEN COALESCE(s.n_relevant, 0) = 0 THEN 0
       |       ELSE (COALESCE(h.n_rel_at_k, 0) * 1000000) // s.n_relevant END
       |    AS BIGINT) AS recall_at_k_ppm,
       |  CAST(COALESCE(s.n_relevant, 0) AS BIGINT) AS n_relevant
       |FROM (SELECT DISTINCT qid FROM ($rankedSql)) q
       |LEFT JOIN hits h USING (qid)
       |LEFT JOIN sizes s USING (qid)
       |ORDER BY qid""".stripMargin
}
