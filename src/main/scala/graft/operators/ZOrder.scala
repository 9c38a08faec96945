package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering: interleave the bits of several
  * quantized dimensions into ONE sort key so that range-partitioning
  * on it co-locates rows that are close in EVERY dimension — the
  * layout trick behind multi-dimensional data skipping. A table range-
  * partitioned on `zValue(a, b)` serves selective predicates on `a`,
  * on `b`, or on both from a small fraction of its files, where
  * sorting by `(a, b)` only ever helps `a`.
  *
  * The curve key is plain integer arithmetic on quantized ranks —
  * `Σ bit_b(v_i) · 2^(b·d+i)` — built from codegen'd primitives
  * (division, modulo, multiply), deterministic cross-engine (q84's
  * oracle replays it), and cheap enough to compute in the write path
  * of a 100 TB table.
  */
object ZOrder {

  /** Quantize a value into [0, 2^bits): rank within [lo, hi), clamped
    * at the edges (same contract as [[Histogram.binOf]]). */
  private[operators] def quantize(x: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = 1L << bits
    val w = (hi - lo) / cells
    least(greatest(floor((x.cast("double") - lit(lo)) / lit(w)).cast("long"),
      lit(0L)), lit(cells - 1L))
  }

  /** The Morton key for `dims` = (value, lo, hi) triples, `bits` bits
    * per dimension: bit b of dimension i lands at position b·d+i. The
    * expression is a flat integer sum — d·bits terms, all inside
    * whole-stage codegen. Total bits d·`bits` must fit a long. */
  def zValue(dims: Seq[(Column, Double, Double)], bits: Int): Column = {
    val d = dims.size
    require(d >= 1 && bits >= 1 && d * bits <= 62,
      s"need 1..62 total bits (got $d dims x $bits)")
    val terms = for {
      (dim, i) <- dims.zipWithIndex
      q = quantize(dim._1, dim._2, dim._3, bits)
      b <- 0 until bits
    } yield pmod(floor(q / lit(math.pow(2.0, b))).cast("long"), lit(2L)) *
      lit(1L << (b * d + i))
    terms.reduce(_ + _)
  }

  /** Cluster a table on the curve: range-partition by z (so partition
    * z-ranges are disjoint and multi-dim-local) and sort within each
    * partition — the write-side layout pass before persisting. */
  def cluster(df: DataFrame, dims: Seq[(Column, Double, Double)], bits: Int,
              numPartitions: Int): DataFrame = {
    val z = zValue(dims, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
