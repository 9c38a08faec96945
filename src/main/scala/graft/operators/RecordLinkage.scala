package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-field record linkage (Fellegi–Sunter-style deterministic
  * scoring): candidate pairs from fuzzy-name blocking, then a weighted
  * integer agreement score across fields — the entity-resolution pass
  * that decides "are these two customer rows the same person?" during
  * warehouse conforming or training-data identity dedup.
  *
  * Score = name weight by edit distance (`nameWeightByDist(d)`) plus
  * each exact field's weight when equal. All weights and comparisons
  * are INTEGER, so the score — and therefore the linked set — is
  * engine-exact; the q130 oracle recomputes it over a brute-force
  * cross join, proving the blocked candidate generator COMPLETE (the
  * q90 pattern).
  *
  * 100 TB shape: candidates come from
  * [[FuzzyJoin.editDistancePairs]]'s deletion-neighborhood equi-join
  * (never O(n²)); attribute re-attach is two hash joins on id against
  * the input; scoring is a projection. Work scales with real name
  * collisions, not the corpus square.
  */
object RecordLinkage {

  /** Linked pairs with their agreement score.
    *
    * @param exactFields      (column, weight) scored on equality
    * @param nameWeightByDist weight at name edit distance d =
    *                         `nameWeightByDist(d)`; length 2 or 3
    *                         (blocking supports distance ≤ 2)
    * @return (id_a, id_b, name_dist, score) with id_a < id_b and
    *         score ≥ threshold
    */
  def link(df: DataFrame, idCol: String, nameCol: String,
           exactFields: Seq[(String, Int)], nameWeightByDist: Seq[Int],
           threshold: Int): DataFrame = {
    require(nameWeightByDist.length >= 2 && nameWeightByDist.length <= 3,
      "nameWeightByDist covers distances 0..1 or 0..2")
    val pairs = FuzzyJoin.editDistancePairs(df, idCol, nameCol,
      maxDist = nameWeightByDist.length - 1)
    def side(tag: String) = df.select(
      col(idCol).as(s"id_$tag") +:
        exactFields.map { case (f, _) => col(f).as(s"${f}_$tag") }: _*)
    val fieldScore = exactFields
      .map { case (f, w) =>
        when(col(s"${f}_a") === col(s"${f}_b"), lit(w)).otherwise(lit(0)) }
      .reduce(_ + _)
    pairs
      .join(side("a"), Seq("id_a"))
      .join(side("b"), Seq("id_b"))
      .withColumn("name_dist", col("dist").cast("int"))
      .withColumn("score",
        element_at(array(nameWeightByDist.map(lit): _*),
          col("name_dist") + 1) + fieldScore)
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("name_dist"), col("score"))
  }
}
