package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — for every interval row, every
  * point row with `start <= point < end`. Spark has no native range
  * join: the inequality-only formulation plans as
  * BroadcastNestedLoopJoin (fine only when one side broadcasts) or a
  * CartesianProduct — O(|intervals| × |points|) compute at scale.
  *
  * Implemented as a BIN join: each interval is exploded to the
  * fixed-width bins it overlaps, each point belongs to exactly ONE bin,
  * and the match becomes a hash equi-join on the bin key followed by
  * the exact residual filter. Cost is
  * O(|intervals| · avg-span/binWidth + |points| + |matches|) with one
  * shuffle each side — the plan Databricks' range-join hint and
  * KDB's window join produce. Because a point has a single bin, no
  * pair can match twice: no distinct is needed, output multiplicity is
  * exactly the inequality join's.
  *
  * `binWidth` tunes the explode factor vs join selectivity: pick it
  * near the TYPICAL interval span, so intervals explode to O(1) bins
  * while each bin stays selective. Extreme outlier spans (≫ binWidth)
  * fan out proportionally — cap or split them upstream.
  *
  * Domain is LongType (caller converts dates/timestamps — e.g.
  * `unix_date`/`unix_micros` — keeping calendar semantics out of the
  * operator). Bins floor-divide, so negative coordinates are handled
  * correctly (exact for |x| < 2⁵³ — the double floor is exact there).
  * Empty/inverted intervals (start >= end) match nothing, like the
  * inequality predicate itself. Null endpoints/points drop out of the
  * join, as SQL comparison semantics would drop them.
  */
object RangeJoin {

  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    floor(c.cast("double") / w).cast("long")

  /** Inner point-in-interval join: all columns of `intervals` then all
    * of `points` (caller disambiguates name collisions upfront). */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String, pointCol: String,
                        binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty,
      s"column names collide across sides: ${overlap.mkString(", ")}")
    val binned = intervals
      .filter(col(startCol) < col(endCol)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(
        floorDiv(col(startCol), binWidth),
        floorDiv(col(endCol) - 1, binWidth)))) // end exclusive
    val pb = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    binned.join(pb, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs where `[aStart, aEnd)` and
    * `[bStart, bEnd)` intersect. Same bin construction on both sides;
    * a pair colliding in several bins is canonicalized to the FIRST
    * shared bin (max of the two start bins), so each overlapping pair
    * emits exactly once without a distinct.
    *
    * `keyPairs` adds equi-key conjuncts `(aKey, bKey)` to the join —
    * intervals then only meet within the same key (a per-entity
    * overlap join), and the shuffle partitions on (key, bin) rather
    * than bin alone, so a hot time range spreads across the key
    * space instead of landing in one bin's partition. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          binWidth: Long,
                          keyPairs: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      s"column names collide across sides: ${overlap.mkString(", ")}")
    def binsOf(df: DataFrame, s: String, e: String) = df
      .filter(col(s) < col(e))
      .withColumn("__bin", explode(sequence(
        floorDiv(col(s), binWidth), floorDiv(col(e) - 1, binWidth))))
    val cond = keyPairs.foldLeft(col("__a.__bin") === col("__b.__bin")) {
      case (c, (ka, kb)) => c && col(s"__a.$ka") === col(s"__b.$kb")
    }
    // Pin the join's parallelism with an explicit keyed repartition
    // (REPARTITION_BY_NUM — AQE never coalesces it): the bin join's
    // INPUT shuffle is rows·(bin key + bounds) — a few MB per million
    // intervals — but its OUTPUT explodes quadratically per (key, bin)
    // group, so byte-based AQE coalescing under-parallelizes exactly
    // this stage (measured at sf0.1: the q133 join collapsed to 3
    // post-shuffle partitions, one carrying a 3 s straggler task — the
    // guide §2.5/§3.3 exploding-join trap). The repartition keys equal
    // the join keys, so EnsureRequirements inserts no further
    // exchange: same shuffle count, pinned width.
    val nParts = a.sparkSession.sessionState.conf.numShufflePartitions
    def pin(df: DataFrame, keys: Seq[String]) =
      df.repartition(nParts, (Seq("__bin") ++ keys).map(col): _*)
    pin(binsOf(a, aStart, aEnd), keyPairs.map(_._1)).alias("__a")
      .join(pin(binsOf(b, bStart, bEnd), keyPairs.map(_._2)).alias("__b"), cond)
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      // first shared bin = bin of max(aStart, bStart): emit-once guard
      .filter(col(s"__a.__bin") ===
        floorDiv(greatest(col(aStart), col(bStart)), binWidth))
      .drop("__bin")
  }
}
