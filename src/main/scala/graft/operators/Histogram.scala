package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width histogram sketch: the one-pass mergeable answer to
  * "what does this numeric column look like" at 100 TB — bin counts
  * from a single map-side-combined aggregation (the shuffle carries at
  * most `bins` rows per upstream partition), mergeable across
  * batches/days with a groupBy-sum, and quantile ESTIMATES from the
  * ≤`bins`-row counter table driver-side. The exact-sort alternative
  * (q45's median) shuffles the whole column; this never moves a row.
  *
  * Determinism: bin assignment is `floor((x−lo)/w)` in IEEE double —
  * identical on any engine — and the counter table is pure integers,
  * so the state is hash-exact cross-engine (q83's oracle replays it).
  * Quantile interpolation happens on the tiny counter table where
  * float determinism no longer matters.
  */
object Histogram {

  /** Bin index for a value: values below `lo` clamp to bin 0, at or
    * above `hi` clamp to the top bin — out-of-range data lands in the
    * edge bins rather than disappearing (an audit sketch must count
    * everything; nulls are the one exception, dropped like every SQL
    * aggregate does). */
  def binOf(x: Column, lo: Double, hi: Double, bins: Int): Column = {
    val w = (hi - lo) / bins
    least(greatest(floor((x.cast("double") - lit(lo)) / lit(w)).cast("long"),
      lit(0L)), lit(bins - 1L))
  }

  /** (bin, cnt) counter table; absent bins saw no values. */
  def counts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
             bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, s"need hi>lo, bins>=1 (got [$lo,$hi) x $bins)")
    df.select(binOf(col(valueCol), lo, hi, bins).as("bin"))
      .filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a collected counter table: for each q,
    * find the bin containing rank ceil(q·n) and interpolate linearly
    * inside it. Driver-side by design — the counter table is ≤ bins
    * rows. */
  def quantiles(counters: Array[(Long, Long)], lo: Double, hi: Double,
                bins: Int, qs: Seq[Double]): Seq[Double] = {
    val w = (hi - lo) / bins
    val sorted = counters.sortBy(_._1)
    val n = sorted.map(_._2).sum
    require(n > 0, "empty histogram")
    qs.map { q =>
      require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
      val rank = math.max(1L, math.ceil(q * n).toLong)
      var acc = 0L
      var ans = hi
      val it = sorted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (bin, cnt) = it.next()
        if (acc + cnt >= rank) {
          val frac = (rank - acc).toDouble / cnt
          ans = lo + w * (bin + frac)
          found = true
        }
        acc += cnt
      }
      ans
    }
  }
}
