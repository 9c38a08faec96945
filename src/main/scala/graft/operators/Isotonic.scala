package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isotonic regression by Pool-Adjacent-Violators (Ayer et al., AoMS
  * 1955; Barlow & Brunk 1972) — the calibration workhorse: fit the
  * best NONDECREASING step function to (x, y) pairs, the standard way
  * to turn a ranking score into a calibrated probability (and the
  * same algorithm scikit-learn/Spark MLlib run under
  * `IsotonicRegression`). Here it is exact integer end to end.
  *
  * Scale shape: one x-keyed map-side-combined aggregate collapses N
  * rows to the x histogram (count n, sum s per distinct x) — the
  * histogram is CONTROL-PLANE SIZED BY CONTRACT (score buckets,
  * quantity levels, calendar days: hundreds of rows, same contract as
  * TimeOps.acf / Survival.kaplanMeier). PAV itself is inherently
  * sequential (a block merge can cascade arbitrarily far left), so it
  * runs as a driver-side stack loop on the collected histogram —
  * O(points) with BigInt cross-multiplied violation tests, no float
  * anywhere. The data-sized path never sees anything but the one
  * aggregate.
  *
  * Determinism: the isotonic L2 fit is UNIQUE (strictly convex
  * objective), so the small-step replay in [[pavOracleSql]] — a
  * recursive CTE advancing one push-or-merge per row with the same
  * integer violation test — lands on identical blocks; fitted values
  * quantize once at the end (`s_blk·10⁶ div n_blk`, both operands
  * nonnegative, so Spark `div` and DuckDB `//` agree).
  */
object Isotonic {

  /** Best nondecreasing fit of mean(`yCol`) as a function of `xCol`.
    *
    * @param df  rows with x (long) and y (long, ≥ 0 — e.g. a 0/1
    *            conversion flag or a nonnegative amount)
    * @return one row per distinct x, ascending:
    *         (x, n, s, fit_ppm) — n/s the x's own count/sum,
    *         fit_ppm the fitted block mean in ppm
    */
  def pavFit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val hist = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("long").as("x"))
      .agg(count(lit(1)).as("n"), sum(col(yCol).cast("long")).as("s"))
      .orderBy("x")
      .collect()
    require(hist.forall(_.getLong(2) >= 0),
      "pavFit needs nonnegative y sums (got a negative block sum)")
    // stack PAV, small-step: push points in x order; while the top
    // two blocks violate (mean left > mean right, cross-multiplied),
    // pool them. Mirrors the oracle's recursive CTE exactly.
    final case class Block(lo: Long, hi: Long, n: BigInt, s: BigInt)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    hist.foreach { r =>
      stack += Block(r.getLong(0), r.getLong(0),
        BigInt(r.getLong(1)), BigInt(r.getLong(2)))
      while (stack.length >= 2 && {
        val l = stack(stack.length - 2); val t = stack.last
        l.s * t.n > t.s * l.n
      }) {
        val t = stack.remove(stack.length - 1)
        val l = stack.remove(stack.length - 1)
        stack += Block(l.lo, t.hi, l.n + t.n, l.s + t.s)
      }
    }
    val fitted = stack.flatMap { b =>
      val fit = (b.s * 1000000) / b.n
      hist.filter(r => r.getLong(0) >= b.lo && r.getLong(0) <= b.hi)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), fit.toLong))
    }.toSeq
    import spark.implicits._
    fitted.toDF("x", "n", "s", "fit_ppm").orderBy("x")
  }

  /** DuckDB replay of [[pavFit]] over `relSql` projecting (x, y):
    * a recursive CTE carrying the PAV stack as a LIST of block
    * structs, advancing ONE push or ONE merge per recursion row —
    * the same small-step loop as the Scala side, HUGEINT
    * cross-multiplied violation test. */
  def pavOracleSql(relSql: String): String =
    s"""WITH RECURSIVE rel AS (SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
       |            FROM ($relSql) WHERE x IS NOT NULL AND y IS NOT NULL),
       |pts AS (SELECT x, CAST(count(*) AS HUGEINT) AS n,
       |          CAST(sum(y) AS HUGEINT) AS s,
       |          row_number() OVER (ORDER BY x) AS i
       |        FROM rel GROUP BY x),
       |np AS (SELECT count(*) AS c FROM pts),
       |walk(step, i, stack) AS (
       |  SELECT 0, CAST(0 AS BIGINT),
       |    CAST([] AS STRUCT(lo BIGINT, hi BIGINT, n HUGEINT, s HUGEINT)[])
       |  UNION ALL
       |  SELECT w.step + 1,
       |    CASE WHEN len(w.stack) >= 2
       |           AND w.stack[-2].s * w.stack[-1].n
       |             > w.stack[-1].s * w.stack[-2].n
       |      THEN w.i ELSE w.i + 1 END,
       |    CASE WHEN len(w.stack) >= 2
       |           AND w.stack[-2].s * w.stack[-1].n
       |             > w.stack[-1].s * w.stack[-2].n
       |      THEN list_append(w.stack[1:len(w.stack) - 2], struct_pack(
       |             lo := w.stack[-2].lo, hi := w.stack[-1].hi,
       |             n := w.stack[-2].n + w.stack[-1].n,
       |             s := w.stack[-2].s + w.stack[-1].s))
       |      ELSE list_append(w.stack, struct_pack(
       |             lo := p.x, hi := p.x, n := p.n, s := p.s)) END
       |  FROM walk w
       |  LEFT JOIN pts p ON p.i = w.i + 1
       |  WHERE (len(w.stack) >= 2
       |           AND w.stack[-2].s * w.stack[-1].n
       |             > w.stack[-1].s * w.stack[-2].n)
       |     OR w.i < (SELECT c FROM np)),
       |fin AS (SELECT stack FROM walk ORDER BY step DESC LIMIT 1),
       |blocks AS (SELECT b.lo, b.hi, b.n AS bn, b.s AS bs
       |           FROM fin, unnest(fin.stack) AS t(b))
       |SELECT p.x, CAST(p.n AS BIGINT) AS n, CAST(p.s AS BIGINT) AS s,
       |       CAST((b.bs * 1000000) // b.bn AS BIGINT) AS fit_ppm
       |FROM pts p JOIN blocks b ON p.x BETWEEN b.lo AND b.hi
       |ORDER BY p.x""".stripMargin
}
