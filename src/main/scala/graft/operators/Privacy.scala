package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audit for release candidates: k-anonymity and
  * l-diversity over quasi-identifier (QID) columns — the standard
  * re-identification checks (Sweeney 2002; Machanavajjhala et al.
  * 2007) a corpus owner runs BEFORE shipping a dataset that carries
  * user-derived attributes. Complements the content-side scrubbers
  * (PII regex, Luhn cards) with a ROW-side audit: even with free text
  * clean, a rare combination of structured attributes can single a
  * person out.
  *
  * Semantics:
  *  - an equivalence class = one distinct QID combination;
  *  - the table is k-anonymous iff every class has ≥ k rows;
  *  - a class is l-diverse for a sensitive column iff it contains
  *    ≥ l distinct sensitive values (k rows that all share the same
  *    sensitive value still leak it — the homogeneity attack).
  * NULL QID values form their own class (null-safe grouping, the SQL
  * GROUP BY convention), so missing data cannot hide risk rows.
  *
  * 100 TB shape: ONE hash-aggregate shuffle on the QID key with full
  * map-side partial aggregation (count + distinct-sensitive both
  * combine partially); output is class-sized, not row-sized, and the
  * risk report is further filtered to the below-threshold classes —
  * typically a vanishing fraction. No window, no self-join, no
  * collect. Generalization (banding) happens BEFORE the shuffle as a
  * compiled projection, so widening bands to reach a target k never
  * adds a pass over the data.
  */
object Privacy {

  /** Numeric generalization: band `c` into fixed-width intervals,
    * rendered as the band's inclusive lower bound (floor(c/w)*w) — the
    * conventional "generalize then audit" preprocessing step. Negative
    * values band consistently (floor, not truncate-toward-zero). */
  def band(c: Column, width: Long): Column = {
    require(width > 0, s"band width must be positive, got $width")
    floor(c / width).cast("long") * width
  }

  /** Per-equivalence-class audit: one row per distinct QID combination
    * with `class_size` (rows) and, when `sensitive` is set,
    * `l_distinct` (distinct sensitive values in the class). */
  def classes(df: DataFrame, qids: Seq[String],
              sensitive: Option[String] = None): DataFrame = {
    require(qids.nonEmpty, "need at least one quasi-identifier column")
    val aggs = count(lit(1)).as("class_size") +:
      sensitive.map(s => countDistinct(col(s)).as("l_distinct")).toSeq
    df.groupBy(qids.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Risk report: equivalence classes violating k-anonymity (size < k)
    * or — when a sensitive column is given — l-diversity
    * (l_distinct < l). These are the rows a release must generalize,
    * suppress, or drop. */
  def riskClasses(df: DataFrame, qids: Seq[String], k: Long,
                  sensitive: Option[String] = None, l: Long = 1): DataFrame = {
    val cls = classes(df, qids, sensitive)
    val kViol = col("class_size") < k
    val cond = if (sensitive.isDefined) kViol || col("l_distinct") < l else kViol
    cls.filter(cond)
  }

  /** Generalization ladder: for every candidate band width, the
    * k-anonymity profile the release WOULD have if the numeric QID
    * were banded at that width — class count, smallest class, and
    * whether the target k is achieved. The "how much do I have to
    * coarsen" question answered in ONE pass: widths explode against
    * the row stream BEFORE the shuffle (|widths| is a handful by
    * contract), one hash-agg to class sizes, one widths-sized
    * roll-up. The per-width profile is exact for ANY ladder; the
    * "first achieving row is the minimal generalization" read-off
    * additionally requires a NESTING ladder (each width divides the
    * next, e.g. 500|1000|2000) — only then do wider bands strictly
    * merge classes and make min_class monotone. Non-divisor ladders
    * (300, 500, …) can interleave band boundaries and yield a
    * non-monotone profile; read each row independently there. */
  def generalizationLadder(df: DataFrame, qids: Seq[String],
                           numCol: String, widths: Seq[Long],
                           k: Long): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "need positive widths")
    val cls = df
      .select((col(numCol) +: qids.map(col)) :+
        explode(typedlit(widths)).as("width"): _*)
      .withColumn("__band", floor(col(numCol) / col("width")).cast("long") * col("width"))
      .groupBy((col("width") +: qids.map(col)) :+ col("__band"): _*)
      .agg(count(lit(1)).as("__c"))
    cls.groupBy("width").agg(
      count(lit(1)).as("n_classes"),
      min(col("__c")).as("min_class"),
      (min(col("__c")) >= k).as("achieves_k"))
  }

  /** Headline audit numbers for a release gate: the table-wide minimum
    * class size (the achieved k), minimum l (achieved diversity), the
    * number of risk classes and the number of ROWS they cover — the
    * re-identifiable population. Single aggregate over the class-sized
    * frame. */
  def summary(df: DataFrame, qids: Seq[String], k: Long,
              sensitive: String, l: Long): DataFrame =
    classes(df, qids, Some(sensitive)).agg(
      min(col("class_size")).as("achieved_k"),
      min(col("l_distinct")).as("achieved_l"),
      sum(when(col("class_size") < k || col("l_distinct") < l, lit(1))
        .otherwise(lit(0))).as("risk_classes"),
      sum(when(col("class_size") < k || col("l_distinct") < l,
        col("class_size")).otherwise(lit(0))).as("risk_rows"))
}
