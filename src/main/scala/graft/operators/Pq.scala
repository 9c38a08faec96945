package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
  * memory side of billion-scale ANN: split each d-dim vector into `m`
  * subvectors, k-means each subspace independently, and store a
  * vector as `m` small centroid codes (m bytes at k ≤ 256) instead of
  * d floats — a 64-dim float vector compresses 32× at m=4/k=16. Top-k
  * search runs over the CODES by asymmetric distance computation
  * (ADC): the query stays exact, each candidate's distance is the sum
  * over subspaces of (query-subvector → its coded centroid) distances.
  * Complements [[Similarity]]'s IVF (which prunes WHICH vectors to
  * scan) — IVF×PQ is the standard composition; here each piece is
  * independently verifiable.
  *
  * Determinism: vectors quantize to integer coordinates
  * (`floor(x·10⁶)` — the corpus convention), training runs
  * driver-side on a CAPPED deterministic sample (the `sampleCap`
  * smallest ids — control-plane-sized, the IVF precedent) with
  * integer Lloyd updates (`floorDiv` means, argmin ties to the lower
  * cell), and encode/ADC are pure integer folds over the codebook
  * broadcast as a LITERAL — so the fitted codebooks render into the
  * DuckDB oracle verbatim and every code and distance replays
  * bit-for-bit.
  *
  * 100 TB shape: encode is a zero-shuffle codegen projection (nested
  * literal lookup + fixed-size folds); the code table is ~m bytes/row
  * — the artifact you CAN keep hot at corpus scale; ADC scans codes
  * with a broadcast query set and one partial top-k aggregation, no
  * join against the raw vectors. Training cost is one `limit.collect`.
  */
object Pq {

  /** Fitted codebooks: `cents(s)(c)` is subspace s's centroid c in
    * quantized integer coordinates (length dims/m). */
  case class Codebooks(m: Int, k: Int, dims: Int,
                       cents: Array[Array[Array[Long]]]) {
    def dsub: Int = dims / m
  }

  private def qvec(vecCol: String): Column =
    transform(col(vecCol), x =>
      floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Driver-side integer Lloyd on the `sampleCap` smallest-id vectors. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, dims: Int, iters: Int = 3,
            sampleCap: Int = 2048): Codebooks = {
    require(m >= 1 && dims % m == 0, s"dims $dims must divide into m=$m")
    require(k >= 1 && iters >= 1)
    val dsub = dims / m
    val sample = corpus
      .select(col(idCol).as("__id"), qvec(vecCol).as("__qv"))
      .orderBy("__id").limit(sampleCap)
      .collect().map(_.getSeq[Long](1).toArray)
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    val cents = Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * dsub, (s + 1) * dsub))
      var c = sub.take(k).map(_.clone())
      for (_ <- 1 until iters) {
        val sums = Array.fill(k, dsub)(0L)
        val ns = Array.fill(k)(0L)
        sub.foreach { v =>
          var best = 0; var bestD = Long.MaxValue
          var i = 0
          while (i < k) {
            var d = 0L; var j = 0
            while (j < dsub) { val t = v(j) - c(i)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = i } // strict: ties → lower
            i += 1
          }
          ns(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += v(j); j += 1 }
        }
        c = Array.tabulate(k, dsub) { (i, j) =>
          if (ns(i) > 0) Math.floorDiv(sums(i)(j), ns(i)) else c(i)(j)
        }
      }
      c
    }
    Codebooks(m, k, dims, cents)
  }

  private def cbLit(cb: Codebooks): Column =
    typedlit(cb.cents.map(_.map(_.toSeq).toSeq).toSeq)

  /** All distance arithmetic runs through the COMPILED integer dot
    * ([[graft.functions.VectorFunctions.intDot]]) via the expansion
    * |a−b|² = a·a − 2·a·b + b·b: per-element HOF folds are interpreted
    * by Spark (measured ~8 ms/row at m·k·dsub = 1024 steps), while
    * one dot per centroid is a tight primitive loop. Centroid norms
    * b·b precompute into literals; the query/row term a·a is constant
    * within an argmin, so rankings AND tie-breaks are unchanged, and
    * emitted distances add a·a back — bit-identical to the fold. */
  private def intDot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.intDot(a, b)

  /** Per-subspace slices of a quantized vector, computed once per row. */
  private def slicesCol(qv: Column, cb: Codebooks): Column =
    transform(sequence(lit(0), lit(cb.m - 1)), s =>
      slice(qv, s * lit(cb.dsub) + lit(1), lit(cb.dsub)))

  /** Precomputed per-centroid squared norms, subspace-major. */
  private def bbLit(cb: Codebooks): Column =
    typedlit(cb.cents.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)

  /** Reduced subspace distance bb − 2·(slice·cent): the true squared
    * L2 minus the row-side aa term (constant per row and subspace). */
  private def reducedDist(slices: Column, s: Column, ci: Column,
                          cpq: Column, bb: Column): Column =
    element_at(element_at(bb, s + lit(1)), ci + lit(1)) -
      lit(2L) * intDot(element_at(slices, s + lit(1)),
        element_at(element_at(cpq, s + lit(1)), ci + lit(1)))

  /** Query-side ADC prep: (query_id, __aa, __tab) where __tab is the
    * subspace-major m·k table of reduced distances to EVERY centroid —
    * the classic ADC lookup table, built with (interpreted) HOFs on
    * the probe-set-sized side only. Entries are exactly
    * [[reducedDist]] longs, so distances assembled from the table are
    * bit-identical to the per-candidate fold they replace. */
  private def adcQuerySide(queries: DataFrame, idCol: String,
                           vecCol: String, cb: Codebooks): DataFrame = {
    val cpq = cbLit(cb); val bb = bbLit(cb)
    queries.select(col(idCol).as("query_id"), qvec(vecCol).as("__qq"))
      .select(col("query_id"), intDot(col("__qq"), col("__qq")).as("__aa"),
        slicesCol(col("__qq"), cb).as("__qsl"))
      .select(col("query_id"), col("__aa"),
        flatten(transform(sequence(lit(0), lit(cb.m - 1)), s =>
          transform(sequence(lit(0), lit(cb.k - 1)), c =>
            reducedDist(col("__qsl"), s, c, cpq, bb)))).as("__tab"))
  }

  /** PQ codes per row: (idCol, codes array<int> of length m) — a
    * zero-shuffle projection. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             cb: Codebooks): DataFrame =
    // project the quantized vector FIRST: folding over qvec(vecCol)
    // directly would inline the full-width transform into every
    // element access — m·k·dsub re-quantizations per row (measured 17×
    // slower). A multi-referenced non-cheap projection survives
    // CollapseProject, so __qv evaluates once per row.
    encodeQuantized(df.select(col(idCol), qvec(vecCol).as("__qv")),
      idCol, "__qv", cb)

  /** HOF reference formulation of the PQ code array: argmin =
    * lexicographic `array_min` over (reduced dist, code) structs —
    * ties to the lower code, ordering identical to the true distance.
    * Kept for differential testing only; the hot path is the compiled
    * [[org.apache.spark.sql.graft.PqCodes]] (HOF lambdas are
    * interpreted per step — corpus-encode dominated the PQ tier). */
  private[operators] def codesExprHof(slices: Column, cb: Codebooks): Column = {
    val cpq = cbLit(cb); val bb = bbLit(cb)
    transform(sequence(lit(0), lit(cb.m - 1)), s =>
      array_min(transform(sequence(lit(0), lit(cb.k - 1)), ci =>
        struct(reducedDist(slices, s, ci, cpq, bb).as("d"), ci.as("c"))))
        .getField("c"))
  }

  private[operators] def slicesColForTest(qv: Column, cb: Codebooks): Column =
    slicesCol(qv, cb)

  /** [[encode]] over an ALREADY-quantized integer vector column — one
    * compiled O(m·k·dsub) pass per row. */
  private def encodeQuantized(df: DataFrame, idCol: String, qvCol: String,
                              cb: Codebooks): DataFrame =
    df.select(col(idCol),
      org.apache.spark.sql.graft.PqCodes(col(qvCol), cb.cents).as("codes"))

  /** ADC top-k: exact queries against coded candidates. Queries
    * broadcast; the scan touches ONLY the code table.
    *
    * @return (query_id, rank, vec_id, dist) — dist is the integer ADC
    *         squared-L2; ties rank by vec_id
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, idCol: String,
              vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    // ADC table per query: the m·k reduced subspace distances
    // precompute ONCE on the (tiny, broadcast) query side — HOFs are
    // fine on 10 rows — and the corpus-sized scan pays m compiled
    // table lookups per candidate (StridedIndexSum), not m interpreted
    // subvector dots
    val q = adcQuerySide(queries, idCol, vecCol, cb)
    val dists = codes.crossJoin(broadcast(q))
      .withColumn("dist", col("__aa") +
        org.apache.spark.sql.graft.StridedIndexSum(col("codes"), col("__tab")))
    rankPerQuery(dists, idCol, k)
      .select(col("query_id"), col("rank"), col(idCol).as("vec_id"), col("dist"))
  }

  /** Per-query ascending-distance top-k + rank via the bounded-heap
    * [[ScaleOps.topKPerKey]] node — never a row_number window over the
    * corpus-sized candidate frame (the window composition full-sorts
    * it; the r13 sf1 run measured 12 min of TimSort on the analogous
    * mutual-kNN frame). Rank is attached on the k-bounded survivor set
    * — identical values because (dist, id) is a total order. */
  private def rankPerQuery(scored: DataFrame, idCol: String,
                           k: Int): DataFrame =
    ScaleOps.topKPerKey(scored, Seq("query_id"),
        Seq(col("dist").asc, col(idCol).asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("dist"), col(idCol))).cast("long"))

  /** IVF×PQ — the standard billion-scale ANN composition: an IVF
    * coarse quantizer prunes WHICH vectors get scanned (nProbe of
    * nCells cells per query), and PQ codes bound the MEMORY of what
    * remains; the scan touches only (cell, codes) pairs, never raw
    * vectors. Both codebooks ride as literals, so cell assignment,
    * probe ranking, and ADC distances all replay integer-exact in the
    * oracle.
    *
    * Scale shape: corpus → (cell, codes) is one zero-shuffle
    * projection; queries (a small probe set by contract) explode to
    * nProbe (query, cell) pairs and the candidate cut is an equi-join
    * on `cell` — at a real deployment the code table is
    * cell-partitioned on disk so the join prunes to touched
    * partitions (the [[Similarity.ivfProbe]] layout; composing with
    * a persisted index is mechanical from here).
    *
    * @param cellCents IVF coarse centroids in quantized coordinates
    *                  (full dims), e.g. from
    *                  [[Similarity.fitQuantizedCentroids]]
    * @return (query_id, rank, vec_id, dist) — ADC distances among
    *         candidates in probed cells only
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, cellCents: Array[Array[Long]],
                cb: Codebooks, nProbe: Int, k: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= cellCents.length)
    val nCells = cellCents.length
    val cc = typedlit(cellCents.map(_.toSeq).toSeq)
    val ccBB = typedlit(cellCents.map(c => c.map(x => x * x).sum).toSeq)
    // reduced cell distance (bb − 2·qv·cent): the row-side aa term is
    // constant within each argmin/ranking, so cell choices match the
    // true distance exactly, at one compiled dot per cell
    def cellRank(qv: Column, ci: Column): Column =
      element_at(ccBB, ci + lit(1)) -
        lit(2L) * intDot(qv, element_at(cc, ci + lit(1)))
    // argmin cell AND PQ codes in ONE zero-shuffle projection over the
    // pre-quantized vector (emitting them separately and re-joining on
    // id would recompute the corpus pass twice and add a shuffle);
    // both argmins are compiled kernels with the same strict-less /
    // lower-index tie rule as the HOF formulations they replace
    val codes = corpus.select(col(idCol), qvec(vecCol).as("__qv"))
      .select(col(idCol),
        org.apache.spark.sql.graft.LongNearestCentroid(col("__qv"), cellCents)
          .as("cell"),
        org.apache.spark.sql.graft.PqCodes(col("__qv"), cb.cents).as("codes"))
    // per query: the nProbe nearest cells by exact distance ordering
    val q = queries.select(col(idCol).as("query_id"), qvec(vecCol).as("__qq"))
    val probes = q
      .select(col("query_id"), col("__qq"),
        explode(sequence(lit(0), lit(nCells - 1))).as("cell"))
      .withColumn("__cd", cellRank(col("__qq"), col("cell")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("__cd"), col("cell"))))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"),
        intDot(col("__qq"), col("__qq")).as("__aa"),
        slicesCol(col("__qq"), cb).as("__qsl"), col("cell"))
    // per-probe ADC table (HOFs on the probe-set-sized side only);
    // the candidate scan pays m compiled lookups per row
    val cpq = cbLit(cb); val bb = bbLit(cb)
    val probesTab = probes.select(col("query_id"), col("__aa"), col("cell"),
      flatten(transform(sequence(lit(0), lit(cb.m - 1)), s =>
        transform(sequence(lit(0), lit(cb.k - 1)), c =>
          reducedDist(col("__qsl"), s, c, cpq, bb)))).as("__tab"))
    val dists = codes.join(broadcast(probesTab), Seq("cell"))
      .withColumn("dist", col("__aa") +
        org.apache.spark.sql.graft.StridedIndexSum(col("codes"), col("__tab")))
    rankPerQuery(dists, idCol, k)
      .select(col("query_id"), col("rank"), col(idCol).as("vec_id"), col("dist"))
  }

  /** PQ quality audit: recall@k of [[adcTopK]] against the EXACT
    * quantized-L2 top-k — the number that says whether m/k are sized
    * right before the codes replace the vectors in production. Runs
    * the exact side as a brute-force broadcast scan (queries are a
    * small probe set by contract).
    *
    * @return (query_id, n_hits, recall_ppm) per query, ordered
    */
  def recallVsExact(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), qvec(vecCol).as("__qq"))
    // rank by the reduced form bb − 2·q·c (the query-side aa term is
    // constant per query): identical order and ties, one compiled dot
    // per pair instead of a dims-wide interpreted fold
    val exact = corpus
      .select(col(idCol).as("vec_id"), qvec(vecCol).as("__cv"))
      .select(col("vec_id"), col("__cv"),
        intDot(col("__cv"), col("__cv")).as("__bb"))
      .crossJoin(broadcast(q))
      .withColumn("__rk",
        col("__bb") - lit(2L) * intDot(col("__qq"), col("__cv")))
      // exact top-k SET per query — bounded heap, no corpus-sized sort
      .transform(df => ScaleOps.topKPerKey(df, Seq("query_id"),
        Seq(col("__rk").asc, col("vec_id").asc), k))
      .select(col("query_id"), col("vec_id"))
    val approx = adcTopK(queries, encode(corpus, idCol, vecCol, cb),
      idCol, vecCol, cb, k).select(col("query_id"), col("vec_id"))
    exact.join(approx, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      .join(q.select(col("query_id")), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(1000000 * coalesce(n_hits, 0)) div $k").as("recall_ppm"))
      .orderBy("query_id")
  }

  /** Two-stage ANN search — the production FAISS composition that
    * closes the PQ recall gap: stage 1 ([[ivfPqTopK]]) cuts
    * `candidates` ≫ k rows per query from the probed cells by cheap
    * ADC distance; stage 2 re-ranks ONLY those candidates with the
    * exact quantized vectors and keeps the top k. ADC error then only
    * costs recall when a true neighbor misses the whole candidate
    * set, not when ADC merely mis-orders it — q195 measures the
    * ADC-only loss, [[refineRecallVsExact]] audits the recovery.
    *
    * Scale shape: the candidate cut inherits stage 1's shape
    * (broadcast probes, cell equi-join); the re-rank joins the
    * (query, candidate-id) pairs — queries·candidates rows, probe-set
    * sized by contract — back to the corpus by vec_id equi-join (at a
    * real deployment the vector store is id-partitioned, so the join
    * prunes to touched partitions), never a second corpus scan
    * ordering by exact distance.
    *
    * @return (query_id, rank, vec_id, dist) — dist is the EXACT
    *         quantized squared-L2 among stage-1 candidates
    */
  def refineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, cellCents: Array[Array[Long]],
                 cb: Codebooks, nProbe: Int, candidates: Int,
                 k: Int): DataFrame = {
    require(candidates >= k, s"candidates $candidates must be >= k $k")
    val cand = ivfPqTopK(queries, corpus, idCol, vecCol, cellCents, cb,
      nProbe, candidates).select(col("query_id"), col("vec_id"))
    val q = queries.select(col(idCol).as("query_id"), qvec(vecCol).as("__qq"))
      .select(col("query_id"), col("__qq"),
        intDot(col("__qq"), col("__qq")).as("__aa"))
    val vecs = corpus.select(col(idCol).as("vec_id"), qvec(vecCol).as("__cv"))
    val dists = cand.join(vecs, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("dist", col("__aa") +
        intDot(col("__cv"), col("__cv")) -
        lit(2L) * intDot(col("__qq"), col("__cv")))
    rankPerQuery(dists, "vec_id", k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("dist"))
  }

  /** Recall@k audit of the two-stage pipeline ([[refineTopK]])
    * against the exact quantized-L2 top-k — the companion number to
    * [[recallVsExact]]'s ADC-only recall: the gap between them is
    * what re-ranking `candidates` exact vectors buys. */
  def refineRecallVsExact(queries: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String,
                          cellCents: Array[Array[Long]], cb: Codebooks,
                          nProbe: Int, candidates: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), qvec(vecCol).as("__qq"))
    val exact = corpus
      .select(col(idCol).as("vec_id"), qvec(vecCol).as("__cv"))
      .select(col("vec_id"), col("__cv"),
        intDot(col("__cv"), col("__cv")).as("__bb"))
      .crossJoin(broadcast(q))
      .withColumn("__rk",
        col("__bb") - lit(2L) * intDot(col("__qq"), col("__cv")))
      // exact top-k SET per query — bounded heap, no corpus-sized sort
      .transform(df => ScaleOps.topKPerKey(df, Seq("query_id"),
        Seq(col("__rk").asc, col("vec_id").asc), k))
      .select(col("query_id"), col("vec_id"))
    val approx = refineTopK(queries, corpus, idCol, vecCol, cellCents, cb,
      nProbe, candidates, k).select(col("query_id"), col("vec_id"))
    exact.join(approx, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      .join(q.select(col("query_id")), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(1000000 * coalesce(n_hits, 0)) div $k").as("recall_ppm"))
      .orderBy("query_id")
  }

  /** DuckDB replay of [[refineTopK]]: the [[ivfPqOracleSql]] text at
    * k = `candidates` as the candidate CTE, exact re-rank on top. */
  def refineOracleSql(cb: Codebooks, cellCents: Array[Array[Long]],
                      corpusSql: String, querySql: String, nProbe: Int,
                      candidates: Int, k: Int): String = {
    val stage1 = ivfPqOracleSql(cb, cellCents, corpusSql, querySql,
      nProbe, candidates)
    s"""WITH cand AS MATERIALIZED ($stage1),
       |ev AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($corpusSql)),
       |qv AS MATERIALIZED (
       |  SELECT vec_id AS query_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($querySql)),
       |rr AS (
       |  SELECT c.query_id, c.vec_id,
       |    CAST(list_sum([(qv.qv[i] - ev.qv[i]) * (qv.qv[i] - ev.qv[i])
       |                   for i in range(1, ${cb.dims} + 1)]) AS BIGINT) AS dist
       |  FROM cand c JOIN ev ON ev.vec_id = c.vec_id
       |  JOIN qv ON qv.query_id = c.query_id)
       |SELECT query_id, rank, vec_id, dist FROM (
       |  SELECT query_id, vec_id, dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, vec_id) AS BIGINT) AS rank
       |  FROM rr) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of [[refineRecallVsExact]] — exact brute side
    * intersected with the [[refineOracleSql]] refined side. */
  def refineRecallOracleSql(cb: Codebooks, cellCents: Array[Array[Long]],
                            corpusSql: String, querySql: String,
                            nProbe: Int, candidates: Int, k: Int): String = {
    val refined = refineOracleSql(cb, cellCents, corpusSql, querySql,
      nProbe, candidates, k)
    s"""WITH ref AS MATERIALIZED ($refined),
       |eq AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($corpusSql)),
       |qq AS MATERIALIZED (
       |  SELECT vec_id AS query_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($querySql)),
       |exact AS MATERIALIZED (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qq.query_id, eq.vec_id,
       |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
       |        list_sum([(qq.qv[i] - eq.qv[i]) * (qq.qv[i] - eq.qv[i])
       |                  for i in range(1, ${cb.dims} + 1)]), eq.vec_id) AS rn
       |    FROM qq, eq) WHERE rn <= $k),
       |hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM exact e JOIN ref ON ref.query_id = e.query_id
       |    AND ref.vec_id = e.vec_id
       |  GROUP BY e.query_id)
       |SELECT qq.query_id, COALESCE(h.n_hits, 0) AS n_hits,
       |  (1000000 * COALESCE(h.n_hits, 0)) // $k AS recall_ppm
       |FROM qq LEFT JOIN hits h ON h.query_id = qq.query_id
       |ORDER BY qq.query_id""".stripMargin
  }

  /** DuckDB replay of [[ivfPqTopK]]: both codebooks as VALUES CTEs —
    * cell assignment argmin, per-query probe ranking, candidate cut
    * by cell, ADC sums, top-k. */
  def ivfPqOracleSql(cb: Codebooks, cellCents: Array[Array[Long]],
                     corpusSql: String, querySql: String,
                     nProbe: Int, k: Int): String = {
    val dsub = cb.dsub
    val cellRows = cellCents.zipWithIndex
      .map { case (cv, i) => s"($i, ${cv.mkString("[", ",", "]")}::BIGINT[])" }
      .mkString(",\n")
    val pqRows = (for (s <- 0 until cb.m; ci <- 0 until cb.k) yield
      s"($s, $ci, ${cb.cents(s)(ci).mkString("[", ",", "]")}::BIGINT[])")
      .mkString(",\n")
    def sqFull(a: String, b: String) =
      s"list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, ${cb.dims} + 1)])"
    def slice(v: String, s: String) = s"$v[$s * $dsub + 1 : $s * $dsub + $dsub]"
    def sqSub(a: String, b: String) =
      s"list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, $dsub + 1)])"
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($corpusSql)),
       |cellc(c, cv) AS MATERIALIZED (VALUES
       |$cellRows),
       |cent(s, c, cv) AS MATERIALIZED (VALUES
       |$pqRows),
       |asn AS MATERIALIZED (
       |  SELECT vec_id, c AS cell FROM (
       |    SELECT e.vec_id, cellc.c,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${sqFull("e.qv", "cellc.cv")}, cellc.c) AS rn
       |    FROM e, cellc) WHERE rn = 1),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT e.vec_id, cent.s, cent.c,
       |      row_number() OVER (PARTITION BY e.vec_id, cent.s
       |        ORDER BY ${sqSub(slice("e.qv", "cent.s"), "cent.cv")}, cent.c) AS rn
       |    FROM e, cent) WHERE rn = 1),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qq
       |  FROM ($querySql)),
       |probe AS MATERIALIZED (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, cellc.c AS cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${sqFull("q.qq", "cellc.cv")}, cellc.c) AS rn
       |    FROM q, cellc) WHERE rn <= $nProbe),
       |dists AS MATERIALIZED (
       |  SELECT q.query_id, codes.vec_id,
       |    CAST(sum(${sqSub(slice("q.qq", "codes.s"), "cent.cv")}) AS BIGINT) AS dist
       |  FROM q JOIN probe ON probe.query_id = q.query_id
       |  JOIN asn ON asn.cell = probe.cell
       |  JOIN codes ON codes.vec_id = asn.vec_id
       |  JOIN cent ON cent.s = codes.s AND cent.c = codes.code
       |  GROUP BY q.query_id, codes.vec_id)
       |SELECT query_id, rank, vec_id, dist FROM (
       |  SELECT query_id, vec_id, dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, vec_id) AS BIGINT) AS rank
       |  FROM dists) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of [[recallVsExact]] (exact brute side + the
    * literal-codebook ADC side, intersected). */
  def recallOracleSql(cb: Codebooks, corpusSql: String, querySql: String,
                      k: Int): String = {
    val adc = adcOracleSql(cb, corpusSql, querySql, k)
    // reuse the ADC oracle as a subquery; exact side is plain SQL
    s"""WITH pq AS MATERIALIZED ($adc),
       |eq AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($corpusSql)),
       |qq AS MATERIALIZED (
       |  SELECT vec_id AS query_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($querySql)),
       |exact AS MATERIALIZED (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qq.query_id, eq.vec_id,
       |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
       |        list_sum([(qq.qv[i] - eq.qv[i]) * (qq.qv[i] - eq.qv[i])
       |                  for i in range(1, ${cb.dims} + 1)]), eq.vec_id) AS rn
       |    FROM qq, eq) WHERE rn <= $k),
       |hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM exact e JOIN pq ON pq.query_id = e.query_id
       |    AND pq.vec_id = e.vec_id
       |  GROUP BY e.query_id)
       |SELECT qq.query_id, COALESCE(h.n_hits, 0) AS n_hits,
       |  (1000000 * COALESCE(h.n_hits, 0)) // $k AS recall_ppm
       |FROM qq LEFT JOIN hits h ON h.query_id = qq.query_id
       |ORDER BY qq.query_id""".stripMargin
  }

  /** DuckDB replay: fitted codebooks as a VALUES CTE, argmin encode
    * (ties → lower code via the ORDER BY), per-subspace ADC sums. */
  def adcOracleSql(cb: Codebooks, corpusSql: String, querySql: String,
                   k: Int): String = {
    val dsub = cb.dsub
    val rows = (for (s <- 0 until cb.m; ci <- 0 until cb.k) yield
      s"($s, $ci, ${cb.cents(s)(ci).mkString("[", ",", "]")}::BIGINT[])")
      .mkString(",\n")
    def slice(v: String, s: String) =
      s"$v[$s * $dsub + 1 : $s * $dsub + $dsub]"
    def sq(a: String, b: String) =
      s"list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, $dsub + 1)])"
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM ($corpusSql)),
       |cent(s, c, cv) AS MATERIALIZED (VALUES
       |$rows),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT e.vec_id, cent.s, cent.c,
       |      row_number() OVER (PARTITION BY e.vec_id, cent.s
       |        ORDER BY ${sq(slice("e.qv", "cent.s"), "cent.cv")}, cent.c) AS rn
       |    FROM e, cent) WHERE rn = 1),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qq
       |  FROM ($querySql)),
       |dists AS MATERIALIZED (
       |  SELECT q.query_id, codes.vec_id,
       |    CAST(sum(${sq(slice("q.qq", "codes.s"), "cent.cv")}) AS BIGINT) AS dist
       |  FROM q, codes JOIN cent ON cent.s = codes.s AND cent.c = codes.code
       |  GROUP BY q.query_id, codes.vec_id)
       |SELECT query_id, rank, vec_id, dist FROM (
       |  SELECT query_id, vec_id, dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, vec_id) AS BIGINT) AS rank
       |  FROM dists) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }
}
