package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path utilities (SURVEY §7.6 / builder brief):
  *
  *  - bucketed warehouse tables: co-locate repeated merges/joins on the
  *    merge key so they plan without an Exchange
  *  - salted two-phase aggregation for skewed keys (beyond what AQE's
  *    skew-join handles — pre-aggregation skew)
  *  - duplicate-cluster canonicalization: pair list → connected
  *    components → canonical (min) id per member
  */
object ScaleOps {

  /** Write a table bucketed by the join/merge key. Subsequent equi-joins
    * and aggregations on `keys` between co-bucketed tables plan with
    * ZERO shuffle on the bucketed sides (verified in ScaleOpsSpec).
    * 100 TB note: pick nBuckets so a bucket ≈ one task's worth of data;
    * the repeated daily merge then shuffles only the staged batch. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Top-k rows per key through the custom whole-operator plan node
    * (see [[org.apache.spark.sql.graft.TopKPerKey]]): a two-phase
    * bounded-heap operator — partial top-k before the key shuffle
    * (map-side combine), exact top-k after — instead of the window
    * composition's full per-partition sorts. The Exchange carries at
    * most `partitions × keys × k` rows. `order` must be total (add a
    * unique-id tie-break) for deterministic output. */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 k: Int): DataFrame =
    org.apache.spark.sql.graft.TopKPerKey(df, keys.map(col), order, k)

  /** Two-phase aggregation for skewed group keys: groupBy (key, salt)
    * first (splits a hot key's rows over `saltBuckets` reducers), then
    * re-aggregate by key. `partials` must be re-aggregable (sum/count/
    * min/max style). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltBuckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + hash(col(valueCol)), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pcount"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__pcount")).as("count"))

  /** Rounds the last [[canonicalize]] call took — test/monitoring
    * introspection (the round count is the operator's scale metric). */
  @volatile private[operators] var lastCanonicalizeRounds: Int = 0

  /** Duplicate-cluster canonicalization: given near-dup pairs
    * (id_a < id_b), assign every id the MINIMUM id of its connected
    * component (transitive closure) — the "keep one copy" step after
    * any Dedup.*Duplicates operator.
    *
    * Each round does (1) neighbor-min propagation (my label =
    * min(mine, neighbors')) and (2) a POINTER JUMP (my label = label of
    * my label) — the jump forwards a label straight to wherever its
    * holder already points, so long chains collapse doubly per round
    * and convergence is O(log component-diameter) rounds instead of the
    * plain propagation's O(diameter) (a 1M-row chain: ~20 rounds, not
    * ~1M). Convergence is checked every 2 rounds — each check is a
    * driver sync, and at 100 TB round-trip latency, not data volume, is
    * what dominates this operator. `maxIterations` bounds pathological
    * graphs; on hitting it a warning is emitted and partially-converged
    * labels are returned (members may then map to more than one
    * "canonical" id).
    *
    * EAGER: runs Spark jobs at call time (edge/label checkpoints plus
    * one convergence count per `checkEvery` rounds). */
  def canonicalize(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    // undirected edge list, both directions, in ONE pass over `pairs`
    // (a union of two selects would compute the upstream pair-finding
    // pipeline twice). localCheckpoint (not persist): materialized
    // once, re-read every round, blocks freed by the ContextCleaner
    // when the final plan is GC'd — nothing stays registered in the SQL
    // cache after the operator returns.
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct().transform(Materialize.once)
    // start: every node labels itself with min(self, neighbors)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("label"))
      .transform(Materialize.once)
    val checkEvery = 2
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // (1) propagate: my new label = min(my label, labels of my neighbors)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "nlabel"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("nlabel")).as("plabel"))
      val stepped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("plabel"), col("label"))).as("label"),
          col("label").as("__old"))
      // (2) pointer jump: follow my label to ITS label (synchronous —
      // the lookup table is the materialized PRE-ROUND state, so the
      // neighbor join isn't recomputed through a self-reference). A
      // label is always a member id of the same component, so the jump
      // stays in the component and is monotone non-increasing — it only
      // accelerates the walk toward the component minimum.
      val lut = labels.select(col("id").as("__lid"), col("label").as("__jlabel"))
      // carry the pre-round label through the checkpoint so convergence
      // is a filter on materialized data, not another join+shuffle.
      // The round checkpoint is LAZY: on check rounds the convergence
      // count is the materializing action (one job, not checkpoint-job
      // + count-job), and unchecked rounds schedule no job at all —
      // their chunk materializes inside the next round's job.
      val next0 = stepped.join(lut, stepped("label") === lut("__lid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__jlabel"), col("label"))).as("label"),
          col("__old"))
      val next =
        if (pairs.sparkSession.conf.get("spark.graft.localCheckpoint", "true").toBoolean)
          next0.localCheckpoint(false)
        else next0.persist()
      i += 1
      // fixpoint test: one full round with zero label changes. Checked
      // at round 1 (near-dup components are usually shallow — init
      // already holds the neighbor min, so round 1 often IS the
      // fixpoint), then every `checkEvery` rounds for deep graphs.
      if (i == 1 || i % checkEvery == 0 || i == maxIterations)
        converged = next.filter(col("label") =!= col("__old")).limit(1).count() == 0
      labels = next.drop("__old")
    }
    lastCanonicalizeRounds = i
    if (!converged)
      System.err.println(
        s"[canonicalize] WARNING: not converged after $maxIterations rounds; " +
          "components wider than the bound carry split canonical ids")
    labels.withColumnRenamed("label", "canonical_id")
  }

  /** Apply canonicalization to a corpus: rows whose id maps to another
    * canonical id are duplicates; keep only canonical survivors. */
  def dropDuplicateRows(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val canon = canonicalize(pairs)
    df.join(canon.filter(col("id") =!= col("canonical_id"))
        .select(col("id").as(idCol)), Seq(idCol), "left_anti")
  }
}
