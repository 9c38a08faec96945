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

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) for an
    * ORDERED sensitive attribute — the distribution-shape check that
    * k-anonymity and l-diversity both miss: a class can be large and
    * diverse yet still concentrate on one end of the sensitive range
    * (every salary in the class "high" leaks as much as one value).
    * t-closeness bounds, per equivalence class, the Earth Mover's
    * Distance between the class's sensitive distribution and the
    * table-wide one under the ordered-distance ground metric:
    *   EMD = Σ_i |Σ_{j≤i} (p_j − q_j)| / (m − 1)
    * over the m ordered sensitive values. All math is exact integer —
    * with global counts G_j (N total) and class counts C_j (n_c), the
    * cumulative term Σ_{j≤i}(C_j·N − G_j·n_c) is the common-denominator
    * numerator of Σ(p−q), accumulated in DECIMAL(38,0); the emitted
    * `emd_ppm` is floor(10⁶·Σ|prefix| / (N·n_c·(m−1))). Classes over a
    * single-valued table (m = 1) score 0. NULL sensitive values are
    * EXCLUDED (an ordered ground metric has no position for NULL) —
    * run [[riskClasses]] for the NULL-class exposure first.
    *
    * 100 TB shape: one hash-agg to the (class × value) counts, the
    * value grid completed by a broadcast of the value-grid-sized
    * global distribution, prefix sums under a CLASS-keyed window whose
    * partitions are m rows each — nothing row-sized is windowed,
    * nothing collects. Banding the sensitive column first
    * (see [[band]]) keeps m value-grid-sized by construction. */
  def tCloseness(df: DataFrame, qids: Seq[String],
                 sensitive: String): DataFrame = {
    require(qids.nonEmpty, "need at least one quasi-identifier column")
    val rows = df.filter(col(sensitive).isNotNull)
    val dec = "decimal(38,0)"
    val vals = rows.groupBy(col(sensitive).as("__v"))
      .agg(count(lit(1)).cast(dec).as("__g"))
    val tot = vals.agg(sum("__g").cast(dec).as("__n_total"),
      count(lit(1)).cast(dec).as("__m"))
    val classCounts = rows
      .groupBy(qids.map(col) :+ col(sensitive).as("__v"): _*)
      .agg(count(lit(1)).cast(dec).as("__c"))
    val classSizes = classCounts.groupBy(qids.map(col): _*)
      .agg(sum("__c").cast(dec).as("__nc"))
    val grid = classSizes
      .crossJoin(broadcast(vals))
      .join(classCounts, qids :+ "__v", "left")
      .na.fill(0, Seq("__c"))
      .crossJoin(broadcast(tot))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qids.map(col): _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid
      .withColumn("__pref",
        sum(col("__c") * col("__n_total") - col("__g") * col("__nc")).over(w))
      .groupBy(qids.map(col): _*)
      .agg(first(col("__nc")).as("__nc2"),
        first(col("__m")).as("__m2"),
        first(col("__n_total")).as("__nt2"),
        sum(abs(col("__pref"))).as("__sabs"))
      .select(qids.map(col) ++ Seq(
        col("__nc2").cast("long").as("class_size"),
        when(col("__m2") <= 1, lit(0L))
          // integral div, not decimal /: exact floor, no scale rounding
          .otherwise(expr(
            "(__sabs * 1000000) div (__nt2 * __nc2 * (__m2 - 1))"))
          .as("emd_ppm")): _*)
  }

  /** DuckDB replica of [[tCloseness]]: `srcSql` yields the filtered
    * row stream with the QID columns and the sensitive column named as
    * passed; output is (qids..., class_size, emd_ppm) ordered by the
    * QIDs. */
  def tClosenessOracleSql(srcSql: String, qids: Seq[String],
                          sensitive: String): String = {
    val q = qids.mkString(", ")
    s"""WITH src AS (SELECT * FROM ($srcSql) WHERE $sensitive IS NOT NULL),
       |vals AS (SELECT $sensitive AS v, CAST(count(*) AS HUGEINT) AS g
       |         FROM src GROUP BY 1),
       |tot AS (SELECT CAST(sum(g) AS HUGEINT) AS n_total,
       |               CAST(count(*) AS HUGEINT) AS m FROM vals),
       |cc AS (SELECT $q, $sensitive AS v, CAST(count(*) AS HUGEINT) AS c
       |       FROM src GROUP BY ALL),
       |cs AS (SELECT $q, CAST(sum(c) AS HUGEINT) AS nc FROM cc GROUP BY ALL),
       |grid AS (SELECT cs.*, vals.v, vals.g, COALESCE(cc.c, 0) AS c
       |  FROM cs CROSS JOIN vals
       |  LEFT JOIN cc ON ${qids.map(k => s"cc.$k = cs.$k").mkString(" AND ")}
       |    AND cc.v = vals.v),
       |pref AS (SELECT $q, nc, v, g,
       |    sum(c * (SELECT n_total FROM tot) - g * nc)
       |      OVER (PARTITION BY $q ORDER BY v
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM grid)
       |SELECT $q, CAST(any_value(nc) AS BIGINT) AS class_size,
       |  CAST(CASE WHEN (SELECT m FROM tot) <= 1 THEN 0
       |    ELSE (sum(abs(p)) * 1000000) //
       |      (any_value(nc) * (SELECT n_total FROM tot) *
       |       ((SELECT m FROM tot) - 1)) END AS BIGINT) AS emd_ppm
       |FROM pref GROUP BY $q
       |ORDER BY $q""".stripMargin
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

  /** portableHash range: 2³². */
  private val HashBound = 4294967296L

  /** k-ary randomized response (Warner 1965; the LOCAL-differential-
    * privacy collection mechanism behind RAPPOR): each row reports its
    * true category with probability p and a uniform draw over all k
    * categories otherwise, then the collector INVERTS the known noise
    * to an unbiased frequency estimate —
    *   t̂_v = (c_v − n·(1−p)/k) / p
    * — so per-row category data is plausibly deniable (ε = ln(1 +
    * k·p/(1−p)) per report) while aggregate counts survive. This is
    * the DISTRIBUTIONAL privacy tool the syntactic tier (k-anonymity /
    * l-diversity / t-closeness) can't provide: those audit a table you
    * still ship; randomized response never ships true rows at all.
    *
    * Exactness discipline: the coin is the portable md5 hash of the
    * row id — keep iff h₁ < keepNum (p = keepNum/2³² exactly), the
    * replacement is category[h₂ mod k] over the SORTED distinct
    * categories — so both engines replay the mechanism bit-for-bit;
    * the estimator is assembled in DECIMAL(38,0) with the exact
    * integer form of the inversion,
    *   est_milli = max(0, c_v·2³²·k − n·(2³²−keepNum)) · 1000
    *               div (keepNum · k)
    * (clamped at 0 BEFORE the division — a true count cannot be
    * negative, and clamping the numerator keeps floor-division
    * semantics engine-identical).
    *
    * 100 TB shape: the category list is a collected control-plane
    * constant (distinct categories of an attribute column — bounded by
    * contract, like Sketches.bloomBitmap's pattern table; guarded at
    * [[MaxRrCategories]]); the mechanism is a compiled per-row
    * projection, and the report is one hash-agg to k rows joined
    * against the k-row true spine. NULL categories are excluded.
    *
    * @return (category, n_true, n_reported, est_milli) — one row per
    *         category, est_milli the estimated true count ×1000 */
  def randomizedResponse(df: DataFrame, catCol: String, idCol: String,
                         keepNum: Long = 3221225472L, // p = 0.75 exactly
                         seed: Int = 91): DataFrame = {
    require(keepNum > 0 && keepNum <= HashBound,
      s"keepNum must be in (0, 2^32], got $keepNum")
    import graft.functions.TextFunctions.portableHash
    val rows = df.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("__cat"),
        col(idCol).cast("string").as("__id"))
    val cats = rows.select("__cat").distinct()
      .orderBy("__cat").limit(MaxRrCategories + 1)
      .collect().map(_.getString(0)).toSeq
    require(cats.size <= MaxRrCategories,
      s"randomizedResponse: > $MaxRrCategories categories — the " +
        "category spine is control-plane by contract; band/bucket the " +
        "attribute first")
    require(cats.nonEmpty, "randomizedResponse: no non-null categories")
    val k = cats.size
    val catArr = array(cats.map(lit): _*)
    val reported = rows.select(
      when(portableHash(col("__id"), seed) < keepNum, col("__cat"))
        .otherwise(element_at(catArr,
          (portableHash(col("__id"), seed + 1) % k).cast("int") + 1))
        .as("__rep"))
      .groupBy(col("__rep").as("category"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__nrep"))
    val trues = rows.groupBy(col("__cat").as("category"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__ntrue"))
    val n = rows.agg(count(lit(1)).cast("decimal(38,0)").as("__n"))
    val spine = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(cats.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("category",
          org.apache.spark.sql.types.StringType, nullable = false))))
    spine
      .join(trues, Seq("category"), "left")
      .join(reported, Seq("category"), "left")
      .crossJoin(broadcast(n))
      .withColumn("__ntrue",
        coalesce(col("__ntrue"), lit(0).cast("decimal(38,0)")))
      .withColumn("__nrep",
        coalesce(col("__nrep"), lit(0).cast("decimal(38,0)")))
      .select(col("category"),
        col("__ntrue").cast("long").as("n_true"),
        col("__nrep").cast("long").as("n_reported"),
        expr(s"(greatest(__nrep * $HashBound * $k - __n * " +
          s"(${HashBound - keepNum}), 0) * 1000) div (${keepNum}L * $k)")
          .cast("long").as("est_milli"))
  }

  /** Category-spine cap for [[randomizedResponse]] (see doc). */
  val MaxRrCategories = 10000

  /** DuckDB replica of [[randomizedResponse]]: `srcSql` yields
    * (id, cat); output is (category, n_true, n_reported, est_milli)
    * ordered by category. Same md5 coin, same sorted spine, same
    * clamped DECIMAL estimator. */
  def randomizedResponseOracleSql(srcSql: String,
                                  keepNum: Long = 3221225472L,
                                  seed: Int = 91): String = {
    def hx(e: String) =
      s"CAST(CAST(('0x' || substr(md5($e), 1, 8)) AS UBIGINT) AS BIGINT)"
    s"""WITH src AS (SELECT CAST(id AS VARCHAR) AS id, CAST(cat AS VARCHAR) AS cat
       |             FROM ($srcSql) WHERE cat IS NOT NULL),
       |cats AS (SELECT cat, CAST(row_number() OVER (ORDER BY cat) - 1 AS BIGINT) AS idx
       |         FROM (SELECT DISTINCT cat FROM src)),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cats),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM src),
       |rep AS (SELECT CASE WHEN ${hx(s"'$seed:' || s.id")} < $keepNum
       |               THEN s.cat ELSE c.cat END AS cat
       |        FROM src s CROSS JOIN kk
       |        LEFT JOIN cats c ON c.idx = ${hx(s"'${seed + 1}:' || s.id")} % kk.k),
       |rc AS (SELECT cat, CAST(count(*) AS HUGEINT) AS nrep FROM rep GROUP BY 1),
       |tc AS (SELECT cat, CAST(count(*) AS HUGEINT) AS ntrue FROM src GROUP BY 1)
       |SELECT c.cat AS category,
       |  CAST(coalesce(tc.ntrue, 0) AS BIGINT) AS n_true,
       |  CAST(coalesce(rc.nrep, 0) AS BIGINT) AS n_reported,
       |  CAST(greatest(coalesce(rc.nrep, 0) * $HashBound * kk.k
       |                  - nn.n * ${HashBound - keepNum}, 0) * 1000
       |       // ($keepNum * kk.k) AS BIGINT) AS est_milli
       |FROM cats c CROSS JOIN kk CROSS JOIN nn
       |LEFT JOIN tc ON tc.cat = c.cat LEFT JOIN rc ON rc.cat = c.cat
       |ORDER BY category""".stripMargin
  }
}
