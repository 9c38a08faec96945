package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokenCount

/** Token-budget allocation across corpus sources by WATER-FILLING —
  * the mixture-planning step between "we want these source weights"
  * and "this is what we can actually sample": each source gets budget
  * proportional to its weight, but no source can give more tokens
  * than it HAS, and the mass a capped source cannot absorb
  * redistributes over the remaining sources (repeat until stable).
  * Skipping the redistribution silently under-trains every small
  * high-weight source — the classic mixture bug.
  *
  * Deterministic integer fixed-round scheme: `rounds` iterations of
  * "mark sources whose proportional share `Brem·w div Wact` meets
  * their cap", then one final assignment (capped → cap, active →
  * floored share; floor dust stays unallocated by design). Flags are
  * monotone, so `rounds ≥ #sources` guarantees the fixpoint; the
  * DuckDB oracle unrolls the SAME round count, so both engines agree
  * even short of fixpoint.
  *
  * 100 TB shape: one map-side-combined (source, tokens) aggregate —
  * the only data-sized stage; the allocation itself is a driver-side
  * loop over the DIM-SIZED source list (the control-plane rule every
  * fitted model here follows).
  */
object TokenBudget {

  /** Pure allocation core over (source, capTokens, weight) rows. */
  def waterFill(perSource: Seq[(String, Long, Long)], budget: Long,
                rounds: Int): Seq[(String, Long, Long, Long, Boolean)] = {
    require(budget >= 0 && rounds >= 1)
    require(perSource.forall(s => s._2 >= 0 && s._3 >= 0))
    var capped = Set.empty[String]
    def brem = budget - perSource.filter(s => capped(s._1)).map(_._2).sum
    def wact = perSource.filterNot(s => capped(s._1)).map(_._3).sum
    // share in BigInt: brem·wt overflows Long at corpus-scale budgets
    // (~1e12 tokens) × large user weights; the quotient itself is
    // always ≤ budget, so the narrowing back to Long is exact. The
    // DuckDB oracle mirrors with a HUGEINT product.
    def share(b: Long, wt: Long, w: Long): Long =
      (BigInt(b) * BigInt(wt) / BigInt(w)).toLong
    for (_ <- 1 to rounds) {
      val (b, w) = (brem, wact)
      if (w > 0 && b > 0)
        capped ++= perSource.collect {
          case (s, cap, wt) if !capped(s) && share(b, wt, w) >= cap => s
        }
    }
    val (b, w) = (brem, wact)
    perSource.map { case (s, cap, wt) =>
      val alloc =
        if (capped(s)) cap
        else if (w > 0 && b > 0) share(b, wt, w)
        else 0L
      (s, cap, wt, alloc, capped(s))
    }
  }

  /** Plan a corpus: aggregate per-source token caps, weight each
    * source by `weightExpr`, fill `budget` tokens.
    *
    * @return (source, cap_tokens, weight, alloc_tokens, capped,
    *         rate_ppm) ordered by source
    */
  def plan(docs: DataFrame, sourceCol: String, textCol: String,
           weights: Map[String, Long], budget: Long,
           rounds: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val caps = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(tokenCount(col(textCol)).cast("long")).as("cap"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val rows = waterFill(
      caps.map { case (s, cap) => (s, cap, weights.getOrElse(s, 0L)) }.toSeq,
      budget, rounds)
    import spark.implicits._
    rows.map { case (s, cap, wt, alloc, capped) =>
      (s, cap, wt, alloc, if (capped) 1L else 0L,
        if (cap > 0) 1000000L * alloc / cap else 0L)
    }.toDF("source", "cap_tokens", "weight", "alloc_tokens", "capped",
      "rate_ppm").orderBy("source")
  }

  /** DuckDB replay: per-source caps from the same token arithmetic,
    * `rounds` unrolled cap-marking rounds, final floored assignment.
    * `weightSql` must yield a `weight` column keyed by `source`. */
  def planOracleSql(docsSql: String, weightSql: String, budgetSql: String,
                    rounds: Int = 8): String = {
    val budget = s"($budgetSql)"
    val steps = (1 to rounds).map { i =>
      s"""f$i AS MATERIALIZED (
         |  SELECT c.source, c.cap, c.w,
         |    f${i - 1}.capped OR (
         |      (SELECT sum(c.w) FROM c JOIN f${i - 1} p ON p.source = c.source
         |       WHERE NOT p.capped) > 0
         |      AND ($budget - COALESCE((SELECT sum(c.cap) FROM c
         |            JOIN f${i - 1} p ON p.source = c.source
         |            WHERE p.capped), 0)) > 0
         |      AND (CAST(($budget - COALESCE((SELECT sum(c.cap) FROM c
         |            JOIN f${i - 1} p ON p.source = c.source
         |            WHERE p.capped), 0)) AS HUGEINT) * c.w)
         |          // (SELECT sum(c.w) FROM c JOIN f${i - 1} p
         |             ON p.source = c.source WHERE NOT p.capped)
         |          >= c.cap) AS capped
         |  FROM c JOIN f${i - 1} ON f${i - 1}.source = c.source)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS MATERIALIZED (
       |  SELECT source,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
       |  FROM ($docsSql)),
       |caps AS MATERIALIZED (
       |  SELECT source, CAST(sum(n) AS BIGINT) AS cap FROM d GROUP BY source),
       |c AS MATERIALIZED (
       |  SELECT caps.source, caps.cap, w.weight AS w
       |  FROM caps JOIN ($weightSql) w ON w.source = caps.source),
       |f0 AS MATERIALIZED (SELECT source, cap, w, false AS capped FROM c),
       |$steps,
       |fin AS MATERIALIZED (
       |  SELECT source, cap, w, capped,
       |    $budget - COALESCE((SELECT sum(cap) FROM f$rounds WHERE capped), 0)
       |      AS brem,
       |    (SELECT sum(w) FROM f$rounds WHERE NOT capped) AS wact
       |  FROM f$rounds)
       |SELECT source, cap AS cap_tokens, CAST(w AS BIGINT) AS weight,
       |  CAST(CASE WHEN capped THEN cap
       |    WHEN wact > 0 AND brem > 0 THEN (CAST(brem AS HUGEINT) * w) // wact
       |    ELSE 0 END AS BIGINT) AS alloc_tokens,
       |  CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped,
       |  CAST(CASE WHEN cap > 0 THEN (1000000 * (CASE WHEN capped THEN cap
       |    WHEN wact > 0 AND brem > 0 THEN (CAST(brem AS HUGEINT) * w) // wact
       |    ELSE 0 END)) // cap ELSE 0 END AS BIGINT) AS rate_ppm
       |FROM fin ORDER BY source""".stripMargin
  }
}
