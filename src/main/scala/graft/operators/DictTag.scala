package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dictionary tagging — annotate every document with which of a fixed
  * keyword/phrase list it contains and how often (topic routing,
  * blocklist scoring, weak labeling). The dictionary is control-plane
  * by contract (it ships inside the compiled matcher, like
  * [[Decontaminate]]'s span probes): the corpus is scanned ONCE per
  * distinct pattern length (Rabin–Karp with exact verification —
  * [[org.apache.spark.sql.graft.MultiPatternCount]]), not once per
  * keyword, with zero shuffle; only matched (doc, keyword) rows
  * survive the explode.
  *
  * Counts are substring occurrences at every start position
  * (overlapping included) — frequency-weighted tagging semantics,
  * deterministic and engine-replayable. Match on token boundaries by
  * padding both text and keywords upstream if word-exact tags are
  * wanted.
  *
  * @return (idCol, keyword, n_occ) — one row per document × matched
  *         keyword, n_occ ≥ 1
  */
object DictTag {

  private val MaxKeywords = 100000

  def tagCounts(df: DataFrame, idCol: String, textCol: String,
                keywords: Seq[String]): DataFrame = {
    require(keywords.nonEmpty, "empty dictionary")
    require(keywords.distinct == keywords, "duplicate keywords in dictionary")
    require(keywords.size <= MaxKeywords,
      s"${keywords.size} keywords breaks the control-plane contract " +
        s"(<= $MaxKeywords); a corpus-sized pattern set needs a join, " +
        "not a compiled matcher")
    val kwArr = array(keywords.map(lit): _*)
    df.select(col(idCol),
      posexplode(org.apache.spark.sql.graft.MultiPatternCount(
        col(textCol), keywords)).as(Seq("__kidx", "n_occ")))
      .filter(col("n_occ") > 0L)
      .select(col(idCol),
        element_at(kwArr, col("__kidx") + 1).as("keyword"),
        col("n_occ"))
  }

  /** DuckDB replay of [[tagCounts]]: contains() prefilter, then an
    * exact position expansion counts every (overlapping) start
    * position. `docsSql` yields (id, text). */
  def tagCountsOracleSql(docsSql: String, idCol: String,
                         keywords: Seq[String]): String = {
    val kwValues = keywords.map(k =>
      "('" + k.replace("'", "''") + "')").mkString(", ")
    s"""WITH kws AS (SELECT kw FROM (VALUES $kwValues) AS t(kw)),
       |d AS (SELECT id, text FROM ($docsSql)),
       |hit AS (SELECT id, text, kw FROM d JOIN kws ON contains(text, kw)),
       |pos AS (SELECT id, kw, text,
       |    unnest(range(1, length(text) - length(kw) + 2)) AS i FROM hit)
       |SELECT id AS $idCol, kw AS keyword, CAST(count(*) AS BIGINT) AS n_occ
       |FROM pos
       |WHERE substr(text, i, length(kw)) = kw
       |GROUP BY id, kw
       |ORDER BY $idCol, keyword""".stripMargin
  }
}
