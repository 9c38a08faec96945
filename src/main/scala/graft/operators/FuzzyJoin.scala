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
    * equi-join, and `levenshtein` verification stays exact.
    *
    * The candidate join runs at DISTINCT-STRING cardinality: identical
    * strings collapse to one representative before keying, so a
    * duplicate-heavy corpus cannot square the key join — the sf1skew
    * corpus (5% of rows sharing ONE literal name) put ~5·10¹⁰ rows
    * through the old id-keyed join (~19 shared deletion keys ×
    * (75k)² id pairs each) before `distinct` saw any of it. Verified
    * string pairs then expand back to id pairs through two string-keyed
    * equi-joins (AQE skew-split-able; output-sized), and identical
    * strings pair within their group at dist 0 directly — no
    * levenshtein, no blocking keys.
    *
    * `maxFrequency` guards the one remaining data-dependent blowup:
    * a string shared by f rows contributes f·(f−1)/2 output pairs all
    * by itself, so a boilerplate value (empty name, "UNKNOWN", a
    * placeholder SKU) makes the OUTPUT quadratic while carrying no
    * linkage signal. Strings shared by more than `maxFrequency` rows
    * are excluded from pairing entirely (the block-size cap every
    * production linkage engine applies). The default (1024 ⇒ ≤ ~524k
    * pairs per group) never binds on corpora whose join strings are
    * near-unique — the q90/q130/q174 oracles prove completeness with
    * the cap at its default; pass `Long.MaxValue` to disable. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int,
                        maxFrequency: Long = 1024L): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist=$maxDist must be 1 or 2")
    require(maxFrequency >= 1, s"maxFrequency=$maxFrequency must be >= 1")
    val rows = Materialize.once(
      df.select(col(idCol).as("id"), col(strCol).as("s"))
        .filter(col("id").isNotNull && col("s").isNotNull))
    // distinct strings with their multiplicities (one partial-agg
    // shuffle); hot strings past the cap drop out of linkage here.
    // h is a 64-bit surrogate so the multi-key candidate dedup
    // shuffles narrow (long, long) pairs, not string pairs — the
    // string-keyed variant measured 2.5× slower on its distinct alone
    val strs = Materialize.once(
      rows.groupBy(col("s")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxFrequency)
        .withColumn("h", xxhash64(col("s"))))
    // Fan the deletion-key explode wide before keying: `strs` comes out
    // of a byte-coalesced aggregation (a few thousand distinct names is
    // KBs), so its checkpoint is 1–2 partitions — and this projection is
    // the map side of the candidate self-join, i.e. the deletion-key
    // generation AND the join probe would run as ONE task (measured at
    // sf0.1: a 3.7 s serial stage inside q130). Round-robin repartition
    // costs one tiny shuffle of the distinct strings and parallelizes
    // the compute-heavy map stage (guide §2.5, input-parallelism fix).
    val keyed = strs
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("h"), explode(deletionKeys(col("s"), maxDist)).as("k"))
    // ha <= hb (not <): a 64-bit collision between two DIFFERENT
    // strings lands on ha == hb, and dropping it would lose a true
    // pair — completeness here is oracle-proved, not probabilistic.
    // The collision guard below keeps exactly one orientation of such
    // pairs and drops the self-pairs the equal-hash cross-attach makes
    val candH = keyed.select(col("k"), col("h").as("ha"))
      .join(keyed.select(col("k"), col("h").as("hb")), Seq("k"))
      .filter(col("ha") <= col("hb"))
      .select("ha", "hb")
      .distinct()
    val candS = candH
      .join(strs.select(col("h").as("ha"), col("s").as("sa")), Seq("ha"))
      .join(strs.select(col("h").as("hb"), col("s").as("sb")), Seq("hb"))
      .filter(col("ha") < col("hb") || col("sa") < col("sb"))
      .select(least(col("sa"), col("sb")).as("str_a"),
        greatest(col("sa"), col("sb")).as("str_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= maxDist)
    // expand verified string pairs to id pairs, re-orienting so that
    // id_a < id_b with each id keeping ITS string
    val sw = col("ia") < col("ib")
    val cross = candS
      .join(rows.select(col("s").as("str_a"), col("id").as("ia")), Seq("str_a"))
      .join(rows.select(col("s").as("str_b"), col("id").as("ib")), Seq("str_b"))
      .select(when(sw, col("ia")).otherwise(col("ib")).as("id_a"),
        when(sw, col("str_a")).otherwise(col("str_b")).as("str_a"),
        when(sw, col("ib")).otherwise(col("ia")).as("id_b"),
        when(sw, col("str_b")).otherwise(col("str_a")).as("str_b"),
        col("dist"))
    // identical strings: all within-group pairs at dist 0, directly
    val dup = rows.join(strs.filter(col("__n") >= 2).select("s"),
      Seq("s"), "leftsemi")
    val within = dup.select(col("s"), col("id").as("id_a"))
      .join(dup.select(col("s"), col("id").as("id_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("s").as("str_a"), col("id_b"),
        col("s").as("str_b"), lit(0).as("dist"))
    cross.unionByName(within)
  }
}
