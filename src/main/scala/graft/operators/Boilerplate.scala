package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-frequency boilerplate detection — the CCNet/jusText move:
  * text fragments that recur across a large fraction of one source's
  * documents (navigation chrome, subscribe banners, license footers)
  * are template, not content, and a training corpus wants them
  * measured and stripped. A fragment here is a word n-gram, which
  * needs no line structure and catches mid-line templates; the same
  * machinery applies to lines by tokenizing on newlines upstream.
  *
  * Detection is per GROUP (source/domain): a shingle is boilerplate in
  * group g when it appears in ≥ `minFracPpm` ppm of g's documents AND
  * in ≥ `minDf` documents (the absolute floor keeps tiny groups from
  * flagging everything). Integer ppm thresholds — no float boundary.
  *
  * Scale shape: one corpus shingling pass (compiled WordShingles,
  * zero shuffle), document frequencies from a distinct + partial-agg
  * count on the (group, shingle, id) key — never a window over
  * postings, so a corpus-wide hot shingle costs a map-side combine,
  * not a single-task straggler. The boiler list joins back against
  * the occurrence stream as a left-semi on (group, shingle) — an
  * ordinary shuffle join bounded by the occurrence count; per-doc
  * stats are one final agg on the id key.
  *
  * @return one row per input document:
  *         (idCol, groupCol, n_occ — total shingle occurrences —
  *         n_boiler_occ, boiler_ppm = n_boiler_occ·10⁶ div n_occ;
  *         NULL ppm for docs with no shingles)
  */
object Boilerplate {

  def frequentNgramStats(df: DataFrame, idCol: String, textCol: String,
                         groupCol: String, n: Int,
                         minFracPpm: Long, minDf: Long): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    require(minFracPpm > 0 && minFracPpm <= 1000000L,
      s"minFracPpm must be in (0, 10^6], got $minFracPpm")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val sh = Materialize.once(df.select(col(idCol).as("id"),
      col(groupCol).as("grp"),
      graft.functions.TextFunctions.wordShingles(col(textCol), n).as("sh")))
    val occ = sh.select(col("id"), col("grp"), explode(col("sh")).as("s"))
      .transform(Materialize.once) // df pass + per-doc tally both read it
    val groupDocs = sh.groupBy(col("grp"))
      .agg(count(lit(1)).as("__gdocs"))
    val docFreq = occ.select(col("grp"), col("s"), col("id")).distinct()
      .groupBy(col("grp"), col("s")).agg(count(lit(1)).as("__df"))
    val boiler = docFreq
      .join(broadcast(groupDocs), Seq("grp"))
      .filter(col("__df") >= minDf &&
        col("__df") * 1000000L >= lit(minFracPpm) * col("__gdocs"))
      .select(col("grp"), col("s"))
    val boilerOcc = occ.join(boiler, Seq("grp", "s"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_boiler_occ"))
    sh.select(col("id"), col("grp"), size(col("sh")).cast("long").as("n_occ"))
      .join(boilerOcc, Seq("id"), "left")
      .select(col("id").as(idCol), col("grp").as(groupCol), col("n_occ"),
        coalesce(col("n_boiler_occ"), lit(0L)).as("n_boiler_occ"),
        when(col("n_occ") === 0L, lit(null).cast("long"))
          .otherwise(expr("(coalesce(n_boiler_occ, 0) * 1000000) div n_occ"))
          .as("boiler_ppm"))
  }

  /** DuckDB replay of [[frequentNgramStats]] for n = 5 over
    * `docsSql` → (id, grp, text). */
  def frequentNgramStatsOracleSql(docsSql: String, idCol: String,
                                  groupCol: String,
                                  minFracPpm: Long, minDf: Long): String =
    s"""WITH d AS (SELECT id, grp, text FROM ($docsSql)),
       |tk AS (SELECT id, grp,
       |    regexp_split_to_array(trim(text), '\\s+') AS ts FROM d),
       |sh AS (SELECT id, grp,
       |    CASE WHEN len(ts) < 5 THEN CAST([] AS VARCHAR[])
       |      ELSE [array_to_string(ts[i:i+4], ' ')
       |            for i in range(1, len(ts) - 3)] END AS sh
       |  FROM tk),
       |occ AS (SELECT id, grp, unnest(sh) AS s FROM sh),
       |gd AS (SELECT grp, count(*) AS gdocs FROM sh GROUP BY grp),
       |dfreq AS (SELECT grp, s, count(DISTINCT id) AS df
       |  FROM occ GROUP BY grp, s),
       |boiler AS (SELECT dfreq.grp, s FROM dfreq JOIN gd ON dfreq.grp = gd.grp
       |  WHERE df >= $minDf AND df * 1000000 >= $minFracPpm * gdocs),
       |bo AS (SELECT id, count(*) AS nb FROM occ
       |  JOIN boiler ON occ.grp = boiler.grp AND occ.s = boiler.s
       |  GROUP BY id)
       |SELECT sh.id AS $idCol, sh.grp AS $groupCol,
       |  CAST(len(sh.sh) AS BIGINT) AS n_occ,
       |  CAST(coalesce(nb, 0) AS BIGINT) AS n_boiler_occ,
       |  CASE WHEN len(sh.sh) = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE CAST(coalesce(nb, 0) * 1000000 // len(sh.sh) AS BIGINT)
       |  END AS boiler_ppm
       |FROM sh LEFT JOIN bo ON sh.id = bo.id
       |ORDER BY $idCol""".stripMargin
}
