package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Bootstrap confidence intervals for grouped means, with DETERMINISTIC
  * resampling: replicate r includes each row `w` times where `w` is
  * Poisson(1) drawn by inverse-CDF from a portable per-(row, replicate)
  * uniform — no RNG state, no sampling order, so every replicate (and
  * therefore every interval endpoint) is bit-reproducible across
  * partitionings, re-runs, and engines.
  *
  * The uniform is the md5-based portable hash of the ROW ID (computed
  * once per row) pushed through per-replicate minstd/Lehmer scrambles
  * mod 2³¹−1 — the same one-expensive-hash + cheap-universal-rehash
  * layout as the MinHash permutations, chosen because the replicate
  * explode evaluates the draw B times per row: B md5s per row was the
  * entire runtime (measured 6×), B integer multiplies is noise. All
  * products stay below 2⁶³ (≤ 69621 · 2³¹). The Poisson CDF is baked
  * in as five integer thresholds on the 2³¹−1 scale (floor(cdf · p),
  * precomputed constants — no libm at query time), truncated at w = 5:
  * P(w > 5 | λ=1) < 6e-5, and BOTH engines apply the same truncation so
  * the match is exact, not approximate.
  *
  * Replicate means are quantized integers: `(10⁶ · Σ w·x) div Σ w` on
  * exact long sums, and the CI endpoints are rank statistics over the
  * replicate means with a total (mean, replicate-id) order — integer
  * rank selection, no interpolation, engine-exact.
  *
  * 100 TB shape: the replicate dimension is a pipelined `explode` of a
  * literal range (rows never materialize B-fold — partial aggregation
  * folds them map-side), so the only shuffle carries
  * groups × reps partial sums; the rank pass windows reps rows per
  * group. Magnitude contract: 10⁶ · Σ w·x must stay below 2⁶³, i.e.
  * group total · 5·10⁶ < 9.2e18 — loud overflow in ANSI mode.
  *
  * A replicate that resamples a group to emptiness (all w = 0) is
  * dropped from that group's rank order; for groups of realistic size
  * this is astronomically rare, and the oracle replays the same rule.
  */
object Bootstrap {

  /** The Lehmer modulus 2³¹−1 and the per-replicate scramble
    * constants (minstd multipliers; the additive spread keeps distinct
    * replicates on distinct orbits before the multiplies). */
  private[graft] val P: Long = 2147483647L
  private[graft] val RepSpread: Long = 99991L
  private[graft] val MulA: Long = 48271L
  private[graft] val MulB: Long = 69621L

  /** floor(P(Poisson(1) ≤ k) · (2³¹−1)) for k = 0..4; w = number of
    * thresholds ≤ the uniform. */
  private[graft] val PoissonCum: Seq[Long] =
    Seq(790015083L, 1580030167L, 1975037709L, 2106706890L, 2139624185L)

  /** The per-(row, replicate) uniform as a Column: `h` must already be
    * reduced mod [[P]]. */
  private[graft] def uniform(h: org.apache.spark.sql.Column,
                             rep: org.apache.spark.sql.Column) = {
    val u0 = (h + rep * RepSpread) % P
    val u1 = (u0 * MulA) % P
    (u1 * MulB) % P
  }

  /** [[uniform]] as SQL text over `h`/`rep` expressions — interpolated
    * into oracles so the constants can never drift. */
  private[graft] def uniformSql(h: String, rep: String): String =
    s"((((($h + $rep * $RepSpread) % $P) * $MulA) % $P) * $MulB) % $P"

  /** The thresholds as an SQL CASE-sum over a `u` expression. */
  private[graft] def poissonWSql(u: String): String =
    PoissonCum.map(t => s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** Grouped bootstrap mean with (lo, hi) rank endpoints.
    *
    * @param df       input; `valueCol` must be an integral column
    *                 (quantize money to cents first)
    * @param idCol    unique row id — the resampling hash key
    * @param reps     bootstrap replicates (B)
    * @param loRank   ascending rank of the lower endpoint in [1, reps]
    * @param hiRank   ascending rank of the upper endpoint
    * @return (groupCol, n, mean_q, lo_q, hi_q) — mean_q the point
    *         estimate, lo_q/hi_q the rank-selected replicate means,
    *         all in 10⁻⁶ units of `valueCol`
    */
  def groupMeanCi(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, reps: Int = 200,
                  loRank: Int = 5, hiRank: Int = 195): DataFrame = {
    require(reps >= 2, s"need reps >= 2: $reps")
    require(1 <= loRank && loRank <= hiRank && hiRank <= reps,
      s"need 1 <= loRank <= hiRank <= reps: $loRank, $hiRank, $reps")
    val point = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("__s"))
      .select(col(groupCol), col("n"),
        expr("(1000000 * __s) div n").as("mean_q"))

    val u = uniform(col("__h"), col("__rep"))
    val w = PoissonCum.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(u >= t, 1L).otherwise(0L)
    }
    // the replicate explode multiplies per-task CPU B-fold, so hash
    // each row ONCE before exploding and spread the base across the
    // full task width FIRST — a tiny base-row shuffle buys B× parallel
    // draw work; a single-file scan would otherwise draw serially in
    // one task
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val repMeans = df
      .withColumn("__h", TextFunctions.portableHash(col(idCol).cast("string")) % P)
      .repartition(nParts)
      .select(col(groupCol), col("__h"), col(valueCol),
        explode(sequence(lit(0), lit(reps - 1))).as("__rep"))
      .withColumn("__w", w)
      .where(col("__w") > 0)
      .groupBy(col(groupCol), col("__rep"))
      .agg(sum(col("__w") * col(valueCol)).as("__swx"), sum("__w").as("__sw"))
      .select(col(groupCol), col("__rep"),
        expr("(1000000 * __swx) div __sw").as("__m"))
    val ranked = repMeans.withColumn("__rn", row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col("__m"), col("__rep"))))
    val ci = ranked.groupBy(col(groupCol)).agg(
      max(when(col("__rn") === loRank, col("__m"))).as("lo_q"),
      max(when(col("__rn") === hiRank, col("__m"))).as("hi_q"))
    point.join(ci, Seq(groupCol))
  }
}
