package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HilbertIndex

/** Hilbert-curve clustering: [[ZOrder]]'s locality-preserving upgrade.
  * Both interleave two quantized dimensions into one sort key for
  * range-partitioned layout; the Hilbert key additionally makes every
  * consecutive index pair a UNIT grid step, so an axis-aligned query
  * box covers in strictly fewer contiguous key runs than under Morton
  * (Moon et al., IEEE TKDE 2001) — fewer, longer scan ranges = fewer
  * files touched by multi-dim data skipping at 100 TB.
  *
  * Same quantization contract as [[ZOrder.zValue]] (rank within
  * [lo, hi), edge-clamped); the curve walk is the compiled
  * [[org.apache.spark.sql.graft.HilbertIndex]] loop, and
  * [[hilbertOracleSql]] unrolls the identical rounds as a DuckDB CTE
  * chain — exact integers end-to-end.
  */
object Hilbert {

  /** The Hilbert key for two (value, lo, hi) dims, `bits` bits per
    * dimension (d < 2^(2·bits)). */
  def hValue(xDim: (Column, Double, Double), yDim: (Column, Double, Double),
             bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1..31 bits per axis, got $bits")
    HilbertIndex(
      ZOrder.quantize(xDim._1, xDim._2, xDim._3, bits),
      ZOrder.quantize(yDim._1, yDim._2, yDim._3, bits), bits)
  }

  /** Cluster a table on the curve (the [[ZOrder.cluster]] write-side
    * layout pass, Hilbert-keyed). */
  def cluster(df: DataFrame, xDim: (Column, Double, Double),
              yDim: (Column, Double, Double), bits: Int,
              numPartitions: Int): DataFrame =
    df.withColumn("__h", hValue(xDim, yDim, bits))
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")

  /** DuckDB replay: the same quantize then `bits` unrolled rounds as a
    * CTE chain over (x, y, d) VALUES — no expression blow-up, exact
    * integers. `rowsSql` must yield key columns plus `hx`, `hy`
    * already quantized to [0, 2^bits). Returns the chain's fragment:
    * CTEs `h0..h$bits`, final state in `h$bits` (columns keyCols, d). */
  def hilbertRoundCtes(rowsSql: String, keyCols: Seq[String], bits: Int): String = {
    val keys = keyCols.mkString(", ")
    val steps = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val sq = s * s
      val m = s - 1
      s"""h${i + 1} AS (SELECT $keys,
         |  d + $sq * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         |                (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d,
         |  CASE WHEN (y & $s) = 0 THEN
         |      CASE WHEN (x & $s) > 0 THEN $m - (y & $m) ELSE (y & $m) END
         |    ELSE (x & $m) END AS x,
         |  CASE WHEN (y & $s) = 0 THEN
         |      CASE WHEN (x & $s) > 0 THEN $m - (x & $m) ELSE (x & $m) END
         |    ELSE (y & $m) END AS y
         |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""h0 AS (SELECT $keys, CAST(hx AS BIGINT) AS x, CAST(hy AS BIGINT) AS y,
       |  CAST(0 AS BIGINT) AS d FROM ($rowsSql)),
       |$steps""".stripMargin
  }
}
