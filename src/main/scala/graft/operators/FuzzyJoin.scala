package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance self-join via deletion-neighborhood blocking (the
  * FastSS / SymSpell family — public algorithm): find all pairs of
  * rows whose strings are within Levenshtein distance 1 WITHOUT the
  * O(n²) cross join.
  *
  * Every string emits `length+1` blocking keys: itself plus each
  * delete-one-character variant. Two strings s, t with lev(s,t) ≤ 1
  * always share a key — equal strings share the identity key; a
  * substitution at position i makes their delete-at-i variants equal;
  * an insertion means deleting the inserted character of the longer
  * string yields the shorter one, which is the shorter string's own
  * identity key. So a hash equi-join on the key set is a COMPLETE
  * candidate generator (proved against the brute-force cross-join
  * oracle in q90), and `levenshtein()` verifies candidates exactly.
  *
  * Scale shape: key generation is a per-row `transform+explode`
  * projection (codegen, no shuffle); the candidate join is one hash
  * shuffle on the key. Blocking-key fan-out is `length+1` per row, so
  * the exploded set is ~L× corpus — for join keys (names, SKUs, URLs)
  * L is tens, not thousands. Group sizes are bounded by how many
  * strings share a deletion variant (data-dependent but tiny for
  * id-like strings); contrast half-string pigeonhole blocking, which
  * degenerates to a cross join when the corpus shares long common
  * prefixes (zero-padded ids — exactly our dimension names).
  *
  * EAGER: runs a Spark job at DataFrame-construction time in the
  * default [[Materialize]] mode (the keyed rows checkpoint once and
  * feed both join sides); `spark.graft.localCheckpoint=false` defers
  * to lazy persist.
  */
object FuzzyJoin {

  /** Identity + delete-one-character variants of `s`, de-duplicated
    * (deleting any character of a run of equal characters yields the
    * same string). Compiled single-pass Expression
    * ([[org.apache.spark.sql.graft.DeletionNeighborhood]]) — this runs
    * on every corpus byte before the blocking shuffle, and the HOF
    * formulation below is interpreted per element. */
  private def deletionKeys(s: org.apache.spark.sql.Column, radius: Int) =
    org.apache.spark.sql.graft.DeletionNeighborhood(s, radius)

  /** The higher-order-function reference formulation of
    * [[deletionKeys]] — kept for the differential spec; semantics must
    * stay bit-compatible with the compiled Expression. */
  private[operators] def deletionKeysHof(s: org.apache.spark.sql.Column) =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(0), length(s) - 1),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))))

  /** All (id_a, str_a, id_b, str_b, dist) pairs with
    * `levenshtein(str_a, str_b) <= 1` and `id_a < id_b`, each pair
    * once. Null ids/strings are dropped — a null has no edit distance
    * to anything.
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame =
    editDistancePairs(df, idCol, strCol, maxDist = 1)

  /** [[editDistance1Pairs]] generalized to `maxDist` ∈ {1, 2}: radius-d
    * deletion neighborhoods stay a COMPLETE candidate generator for
    * `lev <= d` (each edit touches at most one character per side), at
    * `O(length^d)` keys per row — the SymSpell trade: key fan-out grows
    * a factor of ~length per extra distance unit, the join stays a hash
    * equi-join, and `levenshtein` verification stays exact. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist=$maxDist must be 1 or 2")
    val rows = Materialize.once(
      df.select(col(idCol).as("id"), col(strCol).as("s"))
        .filter(col("id").isNotNull && col("s").isNotNull))
    val keyed = rows.select(col("id"),
      explode(deletionKeys(col("s"), maxDist)).as("k"))
    // candidate ids only: the multi-key overlap dedup shuffles narrow
    // (id, id) pairs, not the strings; strings re-attach afterwards via
    // two joins against the (small, known-size) row side
    val cand = keyed.select(col("k"), col("id").as("id_a"))
      .join(keyed.select(col("k"), col("id").as("id_b")), Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(rows.select(col("id").as("id_a"), col("s").as("str_a")), Seq("id_a"))
      .join(rows.select(col("id").as("id_b"), col("s").as("str_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "str_a", "id_b", "str_b", "dist")
  }
}
