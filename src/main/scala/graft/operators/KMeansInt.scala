package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer k-means (Lloyd's algorithm) over an
  * embedding column — the clustering pass behind SemDeDup-style
  * semantic dedup, IVF index training, and corpus topic bucketing,
  * made ENGINE-EXACT the same way the q93 PageRank is: all distance
  * and centroid arithmetic happens on quantized integers, so every
  * assignment and every centroid update is bit-reproducible across
  * engines, partitionings and reruns (no float summation order, no
  * RNG).
  *
  * Scheme: coordinates quantize to `floor(x·scale) + offset` (offset
  * keeps values positive so floor-division semantics agree across
  * engines); distances are integer squared-L2 (ties → lower cell);
  * centroid updates are per-dimension integer floor-division means;
  * an emptied cluster carries its previous centroid forward. Initial
  * centroids are the quantized vectors of the k smallest ids — the
  * deterministic seeding (k-means++ needs an RNG; callers wanting it
  * can pass any seed vectors a deterministic process produced).
  *
  * 100 TB shape (the MLlib layout): centroids are CONTROL-PLANE —
  * k·dim longs collected to the driver each round and re-shipped as a
  * compiled [[org.apache.spark.sql.graft.NearestCentroids]] literal,
  * so assignment is a shuffle-free whole-stage-codegen projection.
  * The update is `posexplode → groupBy(cell, dim)` — dim× row fan-out
  * but map-side partial aggregation collapses each partition to
  * ≤ k·dim rows before the (tiny) shuffle. Total per round: one
  * corpus scan, one k·dim-row exchange. Integer-valued doubles stay
  * exact below 2⁵³ — quantized coords ≤ ~10⁵ and dim ≤ 10³ keep
  * squared distances ≤ 10¹³, far inside the exact window.
  */
object KMeansInt {

  /** Final cell assignment after `iters` Lloyd rounds.
    *
    * @param carryCols input columns carried through to the output
    * @return (idCol, carryCols…, cell) — cell ∈ [0, k)
    */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int, dim: Int,
            scale: Double = 1000.0, offset: Long = 10000L,
            carryCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1 && iters >= 1 && dim >= 1)
    val q = vecs.select(
      (col(idCol) +: carryCols.map(col)) :+
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(scale)).cast("long") + lit(offset))
          .as("__qv"): _*)
      .transform(Materialize.once)

    // deterministic seed: quantized vectors of the k smallest ids
    var centroids: Array[Array[Double]] = q
      .select(col(idCol), col("__qv")).orderBy(col(idCol)).limit(k)
      .collect()
      .map(_.getSeq[Long](1).map(_.toDouble).toArray)
    require(centroids.length == k, s"need >= $k input vectors")

    def assigned = q.withColumn("cell",
      org.apache.spark.sql.graft.NearestCentroids
        .nearestCell(col("__qv"), centroids))

    // iters assignment rounds; a centroid update between each pair
    for (_ <- 1 until iters) {
      val sums = assigned
        .select(col("cell"), posexplode(col("__qv")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      centroids = Array.tabulate(k, dim) { (c, d) =>
        sums.get((c, d)) match {
          case Some((s, n)) => Math.floorDiv(s, n).toDouble
          case None         => centroids(c)(d) // emptied cluster: carry
        }
      }
    }
    assigned.select((col(idCol) +: carryCols.map(col)) :+ col("cell"): _*)
  }
}
