package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked exact DBSCAN (Ester et al., KDD 1996) over integer 2-D
  * coordinates — density clustering for the low-dimensional feature
  * planes a curation pipeline actually plots (quality × length,
  * projected embeddings, geo grids): dense regions become clusters of
  * any shape, sparse points fall out as noise, with no k chosen up
  * front — the complement of k-means (q115) and the coreset picks
  * (q223), which force every point into a ball.
  *
  * Exact semantics, no sampling:
  *  - N_ε(p) = points within euclidean ε of p, INCLUDING p;
  *  - core iff |N_ε(p)| ≥ minPts;
  *  - clusters = connected components of the core-core ε-graph;
  *  - border = non-core within ε of ≥ 1 core — assigned the MINIMUM
  *    neighboring cluster label (deterministic, engines agree; the
  *    textbook "first scan wins" is order-dependent);
  *  - noise = everything else (cluster NULL).
  * Cluster label = the smallest core id in the component, so labels
  * are stable under repartitioning.
  *
  * 100 TB shape: the ε-neighborhood join NEVER goes all-pairs — each
  * point lands in one ε-wide grid cell and probes only the FORWARD
  * HALF of its 3×3 neighborhood (own cell + the 4 lexicographically
  * forward neighbors, a constant 5× fan-out): each unordered cell
  * pair is examined in exactly one direction, so any qualifying pair
  * meets exactly once and the join work is Σ_cell (density ·
  * half-neighborhood density) — half the naive 9-probe volume and
  * still never n². All
  * arithmetic is integer (squared distances on quantized coords — no
  * float boundary anywhere). Components run on the CORE-CORE edge
  * list only (typically ≪ the pair list) through the shared
  * [[ScaleOps.canonicalize]] min-label/pointer-jump loop. Known
  * liability, inherent to EXACT density clustering: a single cell
  * holding k points costs k² candidate pairs — at 100 TB cap density
  * upstream (coarser quantization or a per-cell sample gate), which
  * changes the question, not the operator.
  *
  * Reference semantics: the classic DBSCAN definition; no code
  * consulted.
  *
  * @param eps    radius in coordinate units (cells are eps-wide)
  * @param minPts core threshold, self included (textbook convention)
  * @return (id, x, y, nbrs, role ∈ core|border|noise, cluster —
  *         NULL iff noise)
  */
object Dbscan {

  def cluster(df: DataFrame, idCol: String, xCol: String, yCol: String,
              eps: Long, minPts: Int): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pts = Materialize.once(
      df.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))
    // eps-wide grid cell, FLOOR division (div truncates toward zero on
    // negatives, which would fold cells -1 and 0 together)
    def cellOf(c: String) = expr(s"($c - pmod($c, $eps)) div $eps")
    val home = pts.select(col("id"), col("x"), col("y"),
      cellOf("x").as("cx"), cellOf("y").as("cy"))
    // forward-half-plane probing: own cell plus the 4 neighbors that
    // are lexicographically forward in (cx, cy) order. An unordered
    // pair of ADJACENT DISTINCT cells (A, B) is then examined in
    // exactly one direction (the one where B − A is a forward offset),
    // so the id ordering is only needed for SAME-cell pairs — vs the
    // naive 3×3 probe, the probe explode drops 9× → 5× and the
    // hash-join match volume halves (cross-cell pairs stop matching
    // twice and being halved back by the id filter).
    val offsets = array(Seq((0L, 0L), (0L, 1L), (1L, -1L), (1L, 0L), (1L, 1L))
      .map { case (dx, dy) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)
    val probes = home.select(col("id"), col("x"), col("y"),
        col("cx"), col("cy"), explode(offsets).as("o"))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("o.dx")).as("pcx"),
        (col("cy") + col("o.dy")).as("pcy"),
        (col("o.dx") === 0L && col("o.dy") === 0L).as("own"))
    // every unordered qualifying pair meets EXACTLY once: same-cell
    // pairs via the own-cell probe with the probe-side id smaller;
    // cross-cell pairs via the unique forward direction (ids then
    // re-canonicalized on output so id_a < id_b still holds)
    val pairs = Materialize.once(probes.as("a")
      .join(home.as("b"),
        col("a.pcx") === col("b.cx") && col("a.pcy") === col("b.cy") &&
          (!col("a.own") || col("a.id") < col("b.id")))
      .filter(col("a.id") =!= col("b.id"))
      .filter((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
        (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")) <= eps * eps)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b")))
    val deg = pts.join(
        pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("__d")),
        Seq("id"), "left")
      .select(col("id"), col("x"), col("y"),
        (coalesce(col("__d"), lit(0L)) + 1L).as("nbrs"))
      .transform(Materialize.once)
    val cores = deg.filter(col("nbrs") >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(cores.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(cores.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    // components over core-core edges; isolated cores label themselves
    val canon = ScaleOps.canonicalize(coreEdges)
    val coreLab = cores.join(canon, Seq("id"), "left")
      .select(col("id"), coalesce(col("canonical_id"), col("id")).as("cluster"))
      .transform(Materialize.once)
    // border: non-core endpoint of a (core, non-core) qualifying pair →
    // minimum neighboring cluster label
    val mixed = pairs
      .join(coreLab.select(col("id").as("id_a"), col("cluster").as("__ca")),
        Seq("id_a"), "left")
      .join(coreLab.select(col("id").as("id_b"), col("cluster").as("__cb")),
        Seq("id_b"), "left")
    val borderLab = mixed.filter(col("__ca").isNotNull =!= col("__cb").isNotNull)
      .select(
        when(col("__ca").isNotNull, col("id_b")).otherwise(col("id_a")).as("id"),
        coalesce(col("__ca"), col("__cb")).as("__cl"))
      .groupBy("id").agg(min(col("__cl")).as("cluster"))
    deg
      .join(coreLab.withColumnRenamed("cluster", "__core_cl"), Seq("id"), "left")
      .join(borderLab.withColumnRenamed("cluster", "__border_cl"), Seq("id"), "left")
      .select(col("id"), col("x"), col("y"), col("nbrs"),
        when(col("__core_cl").isNotNull, lit("core"))
          .when(col("__border_cl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__core_cl"), col("__border_cl")).as("cluster"))
  }

  /** DuckDB replica of [[cluster]]: brute-force ε-pairs + recursive
    * min-label components over core-core edges. `srcSql` yields
    * (id, x, y); output matches [[cluster]]'s columns, ordered by id. */
  def dbscanOracleSql(srcSql: String, eps: Long, minPts: Int): String =
    s"""WITH RECURSIVE pts AS (SELECT id, x, y FROM ($srcSql)),
       |pr AS (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
       |  ON a.id < b.id
       |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= $eps*$eps),
       |nb AS (SELECT id, count(*) AS d FROM
       |  (SELECT ia AS id FROM pr UNION ALL SELECT ib FROM pr) GROUP BY 1),
       |deg AS (SELECT p.id, p.x, p.y,
       |    CAST(coalesce(nb.d, 0) + 1 AS BIGINT) AS nbrs
       |  FROM pts p LEFT JOIN nb USING (id)),
       |core AS (SELECT id FROM deg WHERE nbrs >= $minPts),
       |ce AS (SELECT pr.ia AS src, pr.ib AS dst FROM pr
       |    JOIN core ca ON ca.id = pr.ia JOIN core cb ON cb.id = pr.ib
       |  UNION
       |  SELECT pr.ib, pr.ia FROM pr
       |    JOIN core ca ON ca.id = pr.ia JOIN core cb ON cb.id = pr.ib),
       |reach(id, lbl) AS (
       |  SELECT DISTINCT src AS id, src AS lbl FROM ce
       |  UNION
       |  SELECT e.dst AS id, r.lbl FROM reach r JOIN ce e ON e.src = r.id),
       |canon AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |clab AS (SELECT c.id, coalesce(k.lbl, c.id) AS cluster
       |  FROM core c LEFT JOIN canon k USING (id)),
       |bl AS (SELECT x.nid AS id, min(cl.cluster) AS cluster FROM (
       |    SELECT pr.ia AS nid, pr.ib AS cid FROM pr
       |      WHERE pr.ia NOT IN (SELECT id FROM core)
       |        AND pr.ib IN (SELECT id FROM core)
       |    UNION ALL
       |    SELECT pr.ib, pr.ia FROM pr
       |      WHERE pr.ib NOT IN (SELECT id FROM core)
       |        AND pr.ia IN (SELECT id FROM core)) x
       |  JOIN clab cl ON cl.id = x.cid GROUP BY x.nid)
       |SELECT d.id, d.x, d.y, d.nbrs,
       |  CASE WHEN cl.id IS NOT NULL THEN 'core'
       |       WHEN bl.id IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS role,
       |  CAST(coalesce(cl.cluster, bl.cluster) AS BIGINT) AS cluster
       |FROM deg d LEFT JOIN clab cl ON cl.id = d.id
       |  LEFT JOIN bl ON bl.id = d.id
       |ORDER BY d.id""".stripMargin
}
