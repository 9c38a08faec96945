package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry strength ratings from pairwise-preference outcomes —
  * the ranking model under preference-data pipelines (RLHF pair
  * curation, model arenas, search interleaving): given "i beat j"
  * counts, recover per-player strengths w such that
  * P(i beats j) = w_i / (w_i + w_j).
  *
  * Fitted by the classical minorization–maximization recurrence
  * (Hunter, Annals of Statistics 2004):
  *   w_i ← W_i / Σ_j n_ij / (w_i + w_j)
  * run a FIXED number of rounds in integer fixed-point, so the result
  * is bit-identical across engines and replayed exactly by
  * [[bradleyTerryOracleSql]]'s unrolled MATERIALIZED CTEs:
  * ratings are ppm longs (start 10⁶); each round computes
  *   d_i = Σ_j (n_ij · 10¹²) div (w_i + w_j)     (per-pair floor, then
  *                                                order-independent sum)
  *   w'_i = greatest((W_i · 10¹²) div d_i, 1)    (ε-floor: the MLE for
  *                                                a never-winner is 0,
  *                                                which would divide by
  *                                                zero next round)
  * then max-normalizes back to 10⁶ (`(w·10⁶) div max`), the same
  * broadcast-1-row-frame trick as [[GraphOps.hits]] — no per-round
  * driver action. All arithmetic in DECIMAL(38,0).
  *
  * 100 TB shape: outcomes aggregate ONCE to unordered-pair counts
  * (n_ij, wins within the pair) — one shuffle on the pair key, the
  * only data-sized stage. Each round joins the pair table to the
  * player-sized rating frame twice and aggregates per player; pair
  * tables are comparison-matrix-sized (players², usually dim-scale),
  * and the rating frame is player-sized, so rounds are cheap and
  * [[Materialize.once]] per round keeps the plan flat.
  *
  * @param outcomes (winnerCol, loserCol) one row per decided
  *                 comparison; self-matches are dropped
  * @return (player, rating_ppm, wins, games) ordered by player
  */
object PreferenceOps {

  private val S = 1000000L
  private val K = "1000000000000" // 10^12, as a SQL literal (long-safe)

  def bradleyTerry(outcomes: DataFrame, winnerCol: String, loserCol: String,
                   iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val o = outcomes
      .select(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    // unordered pair counts: a < b lexically; wins_a = a's wins in the pair
    val pairs = Materialize.once(o
      .select(least(col("__w"), col("__l")).as("a"),
        greatest(col("__w"), col("__l")).as("b"),
        when(col("__w") < col("__l"), 1L).otherwise(0L).as("__aw"))
      .groupBy("a", "b")
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("__aw")).cast(dec).as("wins_a")))
    val players = Materialize.once(
      pairs.select(col("a").as("player"))
        .union(pairs.select(col("b").as("player"))).distinct())
    val wins = Materialize.once(players
      .join(pairs.select(col("a").as("player"), col("wins_a").as("__x"), col("n"))
        .union(pairs.select(col("b").as("player"),
          (col("n") - col("wins_a")).as("__x"), col("n"))),
        Seq("player"), "left")
      .groupBy("player")
      .agg(coalesce(sum(col("__x")), lit(0).cast(dec)).as("W"),
        coalesce(sum(col("n")), lit(0).cast(dec)).as("games")))
    var w = players.withColumn("r", lit(S).cast(dec))
    for (_ <- 1 to iterations) {
      val stamped = pairs
        .join(broadcast(w.select(col("player").as("a"), col("r").as("__ra"))), Seq("a"))
        .join(broadcast(w.select(col("player").as("b"), col("r").as("__rb"))), Seq("b"))
        .withColumn("__term", expr(s"(n * $K) div (__ra + __rb)"))
      val d = stamped.select(col("a").as("player"), col("__term"))
        .union(stamped.select(col("b").as("player"), col("__term")))
        .groupBy("player").agg(sum(col("__term")).cast(dec).as("__d"))
      val raw = wins.join(d, Seq("player"))
        .select(col("player"),
          expr(s"greatest((W * $K) div __d, 1)").cast(dec).as("r"))
      val mx = raw.agg(max(col("r")).as("__mx"))
      // checkpoint EVERY round — measured, not assumed: a cadence-2
      // variant (skip alternate checkpoints, the louvainGainRounds
      // policy) was A/B'd at sf0.1 and REGRESSED q190 1.36× (medians
      // 3.44 → 4.70 s, non-overlapping arms). Unlike a Louvain round,
      // one BT round references its input ~8× (w twice in stamped,
      // stamped twice in d, raw twice in the normalize, plus the two
      // broadcast max subqueries), so inlining a skipped round grows
      // the next job superlinearly and costs more than the eager
      // checkpoint it saves.
      w = Materialize.once(raw.crossJoin(broadcast(mx))
        .select(col("player"), expr(s"(r * $S) div __mx").cast(dec).as("r")))
    }
    w.join(wins, Seq("player"))
      .select(col("player"), expr("CAST(r AS BIGINT)").as("rating_ppm"),
        expr("CAST(W AS BIGINT)").as("wins"),
        expr("CAST(games AS BIGINT)").as("games"))
      .orderBy("player")
  }

  /** DuckDB replay of [[bradleyTerry]]: identical pair aggregation and
    * unrolled integer MM rounds; every CTE MATERIALIZED (each round
    * references the previous 2–3×, and default inlining multiplies). */
  def bradleyTerryOracleSql(outcomesSql: String, iterations: Int): String = {
    val rounds = (1 to iterations).map { i =>
      s"""t$i AS MATERIALIZED (
         |  SELECT p.a, p.b, (p.n * $K) // (ra.r + rb.r) AS term
         |  FROM pairs p JOIN w${i - 1} ra ON ra.player = p.a
         |               JOIN w${i - 1} rb ON rb.player = p.b),
         |d$i AS MATERIALIZED (
         |  SELECT player, sum(term) AS d FROM (
         |    SELECT a AS player, term FROM t$i
         |    UNION ALL SELECT b, term FROM t$i) GROUP BY player),
         |r$i AS MATERIALIZED (
         |  SELECT wn.player, greatest((wn.W * $K) // d.d, 1) AS r
         |  FROM wins wn JOIN d$i d ON d.player = wn.player),
         |w$i AS MATERIALIZED (
         |  SELECT player, (r * $S) // (SELECT max(r) FROM r$i) AS r
         |  FROM r$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH o AS MATERIALIZED (
       |  SELECT CAST(winner AS VARCHAR) AS w, CAST(loser AS VARCHAR) AS l
       |  FROM ($outcomesSql)
       |  WHERE winner IS NOT NULL AND loser IS NOT NULL
       |    AND CAST(winner AS VARCHAR) <> CAST(loser AS VARCHAR)),
       |pairs AS MATERIALIZED (
       |  SELECT least(w, l) AS a, greatest(w, l) AS b,
       |         CAST(count(*) AS HUGEINT) AS n,
       |         CAST(sum(CASE WHEN w < l THEN 1 ELSE 0 END) AS HUGEINT) AS wins_a
       |  FROM o GROUP BY 1, 2),
       |players AS MATERIALIZED (
       |  SELECT a AS player FROM pairs UNION SELECT b FROM pairs),
       |wins AS MATERIALIZED (
       |  SELECT player, sum(x) AS W, sum(n) AS games FROM (
       |    SELECT a AS player, wins_a AS x, n FROM pairs
       |    UNION ALL SELECT b, n - wins_a, n FROM pairs) GROUP BY player),
       |w0 AS MATERIALIZED (SELECT player, CAST($S AS HUGEINT) AS r FROM players),
       |$rounds
       |SELECT w.player, CAST(w.r AS BIGINT) AS rating_ppm,
       |       CAST(wn.W AS BIGINT) AS wins, CAST(wn.games AS BIGINT) AS games
       |FROM w$iterations w JOIN wins wn ON wn.player = w.player
       |ORDER BY w.player""".stripMargin
  }
}
