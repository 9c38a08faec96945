package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over a ranked result table — the
  * numbers a search/RAG pipeline gates deployments on. Given a ranking
  * (query, rank, doc) and a relevance set (query, doc), emits per-query
  * MRR, precision@k and recall@k as EXACT ppm integers (reciprocal
  * ranks and count ratios are rationals; no float).
  *
  * [[ndcgAtK]] adds the graded-relevance metric (nDCG@k) WITHOUT
  * reintroducing cross-engine float edges: the per-rank log₂ discounts
  * are computed ONCE in Scala as integer nano-weights
  * (floor(10⁹/log₂(i+1))) and the SAME literals are embedded in both
  * the Spark plan and the DuckDB oracle — every engine-side operation
  * is integer multiply/sum/divide.
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

  /** Per-rank nDCG discount weights as integer nano-units:
    * floor(10⁹ / log₂(i+1)) for i = 1..k. Computed once on the driver;
    * the literals feed BOTH engines so no log is ever evaluated
    * engine-side. */
  def ndcgDiscountsNano(k: Int): Seq[Long] = {
    require(k >= 1, s"k must be >= 1: $k")
    (1 to k).map(i => math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0))).toLong)
  }

  /** nDCG@k over a ranked result table with GRADED relevance
    * (qid, doc, grade ≥ 0; absent docs grade 0). Emits per query:
    * `qid, n_graded` (positively-graded docs for the query),
    * `dcg_nano` (Σ grade·discount over the top-k ranking),
    * `idcg_nano` (the ideal ordering's DCG — top-k grades descending),
    * `ndcg_ppm` (= 10⁶·DCG/IDCG, floor; 0 when the query has no graded
    * docs). All arithmetic is exact integer: grades are LONGs,
    * discounts are the [[ndcgDiscountsNano]] literals.
    *
    * Scale shape: ranking is top-k-per-query sized; one equi-join to
    * the grade table, one per-query aggregate. The ideal side never
    * sorts globally — grades collect per query (relevance sets are
    * query-bounded) and the top-k slice + weight fold happen in one
    * array projection. Queries with zero graded docs surface zeroed. */
  def ndcgAtK(ranking: DataFrame, qidCol: String, rankCol: String,
              docCol: String, graded: DataFrame, relQidCol: String,
              relDocCol: String, gradeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val disc = ndcgDiscountsNano(k)
    val discArr = array(disc.map(lit): _*)
    val rel = graded.select(col(relQidCol).as("qid"),
      col(relDocCol).as("doc"), col(gradeCol).cast("long").as("grade"))
    val dcg = ranking
      .select(col(qidCol).as("qid"), col(rankCol).cast("int").as("rank"),
        col(docCol).as("doc"))
      .filter(col("rank") <= k)
      .join(rel, Seq("qid", "doc"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("grade"), lit(0L)) *
        element_at(discArr, col("rank"))).as("dcg_nano"))
    val ideal = rel.filter(col("grade") > 0)
      .groupBy("qid")
      .agg(count(lit(1)).as("n_graded"),
        slice(sort_array(collect_list(col("grade")), asc = false), 1, k)
          .as("gs"))
      .select(col("qid"), col("n_graded"),
        aggregate(
          zip_with(col("gs"), slice(discArr, lit(1), size(col("gs"))),
            (g, w) => g * w),
          lit(0L), (acc, x) => acc + x).as("idcg_nano"))
    ranking.select(col(qidCol).as("qid")).distinct()
      .join(dcg, Seq("qid"), "left")
      .join(ideal, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_graded"), lit(0L)).as("n_graded"),
        coalesce(col("dcg_nano"), lit(0L)).as("dcg_nano"),
        coalesce(col("idcg_nano"), lit(0L)).as("idcg_nano"),
        when(coalesce(col("idcg_nano"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(coalesce(dcg_nano, 0L) * 1000000L) div idcg_nano"))
          .as("ndcg_ppm"))
      .orderBy("qid")
  }

  /** DuckDB replica of [[ndcgAtK]]: `rankedSql` yields
    * (qid, rank, doc_id), `gradedSql` (qid, doc_id, grade). The
    * discount VALUES literals are the same [[ndcgDiscountsNano]]
    * integers the Spark plan embeds. */
  def ndcgOracleSql(rankedSql: String, gradedSql: String, k: Int): String = {
    val discVals = ndcgDiscountsNano(k).zipWithIndex
      .map { case (w, i) => s"(${i + 1}, ${w}::BIGINT)" }.mkString(", ")
    s"""WITH ranked AS (SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id
       |                FROM ($rankedSql) WHERE rank <= $k),
       |rel AS (SELECT qid, doc_id, CAST(grade AS BIGINT) AS grade
       |        FROM ($gradedSql)),
       |disc(i, w) AS (VALUES $discVals),
       |dcg AS (SELECT r.qid,
       |    CAST(sum(COALESCE(g.grade, 0) * d.w) AS BIGINT) AS dcg_nano
       |  FROM ranked r JOIN disc d ON d.i = r.rank
       |  LEFT JOIN rel g ON g.qid = r.qid AND g.doc_id = r.doc_id
       |  GROUP BY r.qid),
       |pos AS (SELECT qid, grade,
       |    row_number() OVER (PARTITION BY qid
       |                       ORDER BY grade DESC, doc_id) AS i
       |  FROM rel WHERE grade > 0),
       |ideal AS (SELECT p.qid,
       |    CAST(count(*) AS BIGINT) AS n_graded,
       |    CAST(sum(CASE WHEN p.i <= $k THEN p.grade * d.w ELSE 0 END)
       |      AS BIGINT) AS idcg_nano
       |  FROM pos p LEFT JOIN disc d ON d.i = p.i
       |  GROUP BY p.qid),
       |qs AS (SELECT DISTINCT qid FROM ($rankedSql))
       |SELECT q.qid,
       |  CAST(COALESCE(i.n_graded, 0) AS BIGINT) AS n_graded,
       |  CAST(COALESCE(c.dcg_nano, 0) AS BIGINT) AS dcg_nano,
       |  CAST(COALESCE(i.idcg_nano, 0) AS BIGINT) AS idcg_nano,
       |  CAST(CASE WHEN COALESCE(i.idcg_nano, 0) = 0 THEN 0
       |       ELSE (COALESCE(c.dcg_nano, 0) * 1000000) // i.idcg_nano END
       |    AS BIGINT) AS ndcg_ppm
       |FROM qs q
       |LEFT JOIN dcg c USING (qid)
       |LEFT JOIN ideal i USING (qid)
       |ORDER BY qid""".stripMargin
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
