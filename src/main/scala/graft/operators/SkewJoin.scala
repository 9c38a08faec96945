package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the manual pattern for when AQE's
  * runtime skew splitting is unavailable (non-shuffle-stage inputs,
  * fixed engines, streaming micro-batches) or when one key dominates
  * so heavily that even split shuffle blocks overwhelm a task.
  *
  * The fact side appends a uniform salt in `[0, saltFactor)` derived
  * from a high-cardinality column (NOT a random — reruns must route
  * rows identically for deterministic output layout); the dim side is
  * replicated `saltFactor`× with every salt value. The join key
  * becomes `(key, salt)`, so a key holding p% of the fact spreads over
  * `saltFactor` tasks instead of one. Cost: dim bytes × saltFactor —
  * pick saltFactor ≈ (largest key share × tasks), not thousands.
  *
  * q49 demonstrates salted AGGREGATION (two-phase reduce); this is the
  * join-side counterpart. Result is row-identical to the plain join
  * (oracle-checked, q96).
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on `key`, salted `saltFactor` ways.
    * `saltSource` must be a fact column that varies within a key
    * (an id); the salt is its portable hash mod saltFactor. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     saltSource: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 2, "saltFactor < 2 is a plain join")
    val salted = fact.withColumn("__salt",
      pmod(graft.functions.TextFunctions.portableHash(
        col(saltSource).cast("string"), 0), lit(saltFactor)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
