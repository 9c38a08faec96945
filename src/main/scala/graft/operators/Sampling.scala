package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash

/** Deterministic sampling, splitting and corpus mixing for reproducible
  * training datasets.
  *
  * `sample(fraction)`/`randomSplit` draw from a per-task RNG, so the
  * selected ROWS change with partitioning, retries, and cluster size —
  * acceptable for statistics, fatal for "train on exactly this 30%,
  * hold out exactly that 10%, forever". These operators decide
  * membership from the md5-portable hash of (seed, id) instead: a pure
  * per-row projection (no shuffle, no RNG state), the same rows on any
  * cluster, any partition count, any engine — and therefore
  * oracle-checkable in DuckDB (q51).
  *
  * The hash is uniform on [0, 2³²), so `fraction` is honored in
  * expectation with binomial concentration (±O(1/√n) realized), the
  * same contract as Bernoulli sampling.
  */
object Sampling {

  private val Bound = 4294967296L // 2^32: portableHash range

  /** Uniform [0, 1) decision value for a row: h32(seed:id) / 2³². */
  private def decision(idCol: Column, seed: Int): Column =
    portableHash(idCol.cast("string"), seed).cast("double") / lit(Bound.toDouble)

  /** Keep exactly the rows whose decision value < fraction —
    * deterministic in (seed, id), independent of everything else.
    * NULL ids have no decision value and are dropped (same as
    * [[assignSplit]], which labels them null). */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          seed: Int = 0): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction out of [0,1]")
    df.filter(decision(col(idCol), seed) < fraction)
  }

  /** Assign every row a split label by carving [0,1) into cumulative
    * weight ranges — the reproducible train/val/test split. Weights
    * need not sum to 1; they are normalized. NULL ids get a NULL label
    * (not a silent assignment to the last split — polluting the
    * holdout set with every unkeyed row would be invisible).
    *
    * Cross-engine caveat: the cut points are the IEEE-double cumulative
    * sum `acc + w/total` in declaration order. An external replica
    * (e.g. a hand-written SQL oracle) must derive its thresholds with
    * the SAME float fold, not algebraically equivalent decimals —
    * arbitrary weights can put a cut one ulp away from the "exact"
    * value, and a row whose decision value lands in that ulp would be
    * labeled differently. (Round decimal weights like 0.8/0.1/0.1
    * reproduce exactly; q51's oracle relies on that.) */
  def assignSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                  seed: Int = 0): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "need positive split weights")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val d = decision(col(idCol), seed)
    val label = splits.zip(cuts.sliding(2).toSeq).foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), Seq(lo, hi))) =>
        when(d >= lo && d < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split",
      when(col(idCol).isNull, lit(null).cast("string")).otherwise(label))
  }

  /** Stratified deterministic sampling: per-stratum keep fractions over
    * the same hash decision as [[deterministicSample]] — "50% of en,
    * all of de, none of the rest" in one shuffle-free pass. Strata
    * absent from `fractions` fall back to `defaultFraction`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0, seed: Int = 0): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0,1]")
    val frac = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultFraction)) { case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(f)).otherwise(acc)
      }
    df.filter(decision(col(idCol), seed) < frac)
  }

  /** Deterministic token-budget fill: within each stratum, walk rows in
    * (seed, id)-hash order and keep them while the stratum's running
    * token total stays within `budgetPerStratum` — the "fill 10B
    * tokens from this mix" step, reproducible on any cluster because
    * the walk order is a pure hash, not arrival order. One window per
    * stratum (state = one running sum per partition key); at extreme
    * per-stratum cardinality pre-aggregate or sub-stratify first. */
  def fillTokenBudget(df: DataFrame, idCol: String, stratumCol: String,
                      tokenCol: String, budgetPerStratum: Long,
                      seed: Int = 0): DataFrame = {
    require(budgetPerStratum > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(portableHash(col(idCol).cast("string"), seed), col(idCol))
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= budgetPerStratum)
      .drop("__cum")
  }

  /** Mix corpora with per-source sampling rates, tagging provenance:
    * the reproducible "40% of web, all of books" dataset-mixing step.
    * Columns are unioned by name (sources must share a schema). Each
    * source draws with its own seed (derived from the source name), so
    * corpora sharing an id scheme get INDEPENDENT samples — one shared
    * hash would select id-identical subsets from every source. */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], idCol: String,
                 seed: Int = 0): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique (they derive the per-source seed)")
    sources.map { case (name, df, fraction) =>
      // String.hashCode is specified (31-polynomial) → stable everywhere
      deterministicSample(df, idCol, fraction, seed ^ name.hashCode)
        .withColumn("source_corpus", lit(name))
    }.reduce(_.unionByName(_))
  }
}
