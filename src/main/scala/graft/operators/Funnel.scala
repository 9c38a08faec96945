package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel: how many users progress through a
  * sequence of event types in strict timestamp order (the
  * view → click → purchase conversion ladder every product-analytics
  * stack computes).
  *
  * Semantics — greedy earliest-completion chain: step 1's timestamp is
  * the user's earliest step-1 event; step i's timestamp is the
  * earliest step-i event STRICTLY after step i-1's. Greedy is exact
  * here: taking the earliest possible timestamp at every step can only
  * enlarge the set of later events still eligible, so a user completes
  * the chain iff the greedy chain completes (no window cap — a capped
  * funnel loses this exchange property and needs per-start search).
  *
  * Scale shape: ONE shuffle. Events are grouped per user and the chain
  * is folded ARRAY-SIDE over the time-sorted event list with
  * `aggregate()` — no per-step join cascade, no window function, so k
  * funnel steps cost zero extra stages. Per-user event lists are
  * product-bounded (the q124 sequence contract); the fold state is k
  * longs.
  *
  * Determinism: events sort by (epoch µs, event id) — a total order —
  * and "strictly after" compares µs, so same-µs step events never
  * chain (identically in the oracle).
  */
object Funnel {

  /** Per-step reach table: `step_idx, step_name, users_reached,
    * total_gap_us` (sum over reaching users of the µs gap from the
    * previous step; 0 for step 1), ordered by step. */
  def steps(events: DataFrame, userCol: String, tsCol: String,
            typeCol: String, idCol: String, stepNames: Seq[String]): DataFrame = {
    require(stepNames.size >= 2, s"need >= 2 funnel steps: $stepNames")
    require(stepNames.distinct.size == stepNames.size,
      s"funnel steps must be distinct: $stepNames")
    val k = stepNames.size
    val stepLit = array(stepNames.map(lit): _*)

    val perUser = events.filter(col(typeCol).isin(stepNames: _*))
      .groupBy(col(userCol).as("user"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("us"),
        col(idCol).as("id"),
        col(typeCol).as("typ")))).as("seq"))

    // fold state: k chain timestamps, -1 = step not yet reached. An
    // event advances step i iff its type matches, step i is unreached,
    // and step i-1 was reached strictly earlier.
    val chain = aggregate(
      col("seq"),
      array_repeat(lit(-1L), k),
      (st: Column, ev: Column) =>
        transform(sequence(lit(1), lit(k)), i =>
          when(element_at(st, i) >= 0, element_at(st, i))
            .otherwise(when(
              ev.getField("typ") === element_at(stepLit, i) &&
                (i === 1 || (element_at(st, i - 1) >= 0 &&
                  ev.getField("us") > element_at(st, i - 1))),
              ev.getField("us")).otherwise(-1L))))

    perUser.select(col("user"), chain.as("chain"))
      .select(posexplode(col("chain")).as(Seq("i", "ts_us")),
        col("chain"))
      .filter(col("ts_us") >= 0)
      .select((col("i") + 1).cast("long").as("step_idx"),
        element_at(stepLit, col("i") + 1).as("step_name"),
        when(col("i") === 0, 0L)
          .otherwise(col("ts_us") - element_at(col("chain"), col("i")))
          .as("gap_us"))
      .groupBy("step_idx", "step_name")
      .agg(count(lit(1)).as("users_reached"),
        sum("gap_us").as("total_gap_us"))
      .orderBy("step_idx")
  }

  /** DuckDB replica: the greedy chain via k chained earliest-after
    * aggregations (equivalent to the array fold — see scaladoc). */
  def stepsOracleSql(eventsSql: String, stepNames: Seq[String]): String = {
    val k = stepNames.size
    val stepCtes = stepNames.zipWithIndex.map { case (name, ix) =>
      val i = ix + 1
      if (i == 1)
        s"""s1 AS (SELECT u, min(us) AS t1 FROM ev WHERE typ = '$name' GROUP BY u)"""
      else
        s"""s$i AS (SELECT ev.u, min(ev.us) AS t$i
           |  FROM ev JOIN s${i - 1} p ON p.u = ev.u
           |  WHERE ev.typ = '$name' AND ev.us > p.t${i - 1}
           |  GROUP BY ev.u)""".stripMargin
    }.mkString(",\n")
    val rows = stepNames.zipWithIndex.map { case (name, ix) =>
      val i = ix + 1
      val gap = if (i == 1) "0"
      else s"s$i.t$i - s${i - 1}.t${i - 1}"
      val joins = (2 to i).map(j => s"JOIN s$j ON s$j.u = s1.u").mkString(" ")
      s"""SELECT CAST($i AS BIGINT) AS step_idx, '$name' AS step_name,
         |  CAST(count(*) AS BIGINT) AS users_reached,
         |  CAST(COALESCE(sum($gap), 0) AS BIGINT) AS total_gap_us
         |FROM s1 $joins""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |                   event_type AS typ
       |            FROM ($eventsSql)),
       |$stepCtes
       |SELECT * FROM ($rows) ORDER BY step_idx""".stripMargin
  }
}
