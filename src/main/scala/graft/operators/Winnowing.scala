package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w` over the
  * k-gram hash sequence and keep each window's MINIMUM hash (rightmost
  * on ties). The selected (position, hash) set is a ~2/(w+1)-density
  * fingerprint with a GUARANTEE minhash lacks: any shared substring of
  * at least w+k−1 tokens between two documents is certain to share at
  * least one selected fingerprint — local, not whole-document,
  * similarity, which is what plagiarism/mirror/boilerplate detection
  * actually needs.
  *
  * Determinism: gram hash = first 15 md5 hex chars of "win:"+gram as a
  * 60-bit integer (the repo's portable-hash convention — replayed
  * verbatim in DuckDB), and the rightmost-min tie rule makes the
  * selection a pure function of the token sequence. Fingerprint picks
  * are provably non-decreasing in position as the window slides, so
  * the dedup'd pick list is position-sorted by construction and the
  * digest is order-canonical without an extra sort.
  *
  * 100 TB shape: everything is per-row array arithmetic (shingle →
  * hash → window-min fold) — a zero-shuffle codegen projection, the
  * same scaling class as MinhashSignature; only downstream uses (e.g.
  * grouping docs by shared fingerprints) shuffle.
  *
  * Short docs: with fewer than `w` grams the whole sequence is one
  * clipped window (fingerprint = global min), so every non-empty doc
  * gets at least one fingerprint; docs with fewer than `k` tokens have
  * none.
  *
  * @return idCol ++ (n_grams, n_fp, fp_digest) where fp_digest =
  *         md5 over the ","-joined "pos:hash" pick list
  */
object Winnowing {

  private def gramHashes(text: Column, k: Int): Column =
    transform(graft.functions.TextFunctions.wordShingles(text, k),
      g => conv(substring(md5(concat(lit("win:"), g)), 1, 15), 16, 10)
        .cast("long"))

  /** (pos, hash) picks as an array<struct<p,h>>, position-sorted;
    * empty array for an empty hash sequence. */
  private[operators] def picks(hashes: Column, w: Int): Column = {
    require(w >= 1, "need window w >= 1")
    val m = size(hashes)
    // for each window start i: fold j over [i, min(i+w-1, m-1)] keeping
    // the minimal hash, ties to the LARGEST j (ascending fold updates
    // on equality) — then distinct across overlapping windows
    val core = array_distinct(transform(
      sequence(lit(0), greatest(m - lit(w), lit(0))),
      i => aggregate(
        sequence(i, least(i + lit(w - 1), m - lit(1))),
        struct(lit(Long.MaxValue).as("h"), lit(-1).as("p")),
        (acc, j) => {
          val hj = element_at(hashes, j + lit(1))
          when(hj <= acc.getField("h"),
            struct(hj.as("h"), j.as("p"))).otherwise(acc)
        },
        acc => struct(acc.getField("p").as("p"), acc.getField("h").as("h")))))
    when(m === 0, array().cast("array<struct<p:int,h:bigint>>"))
      .otherwise(core)
  }

  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    val hs = gramHashes(col(textCol), k)
    df.select(col(idCol), hs.as("__hs"))
      .withColumn("__fp", picks(col("__hs"), w))
      .select(col(idCol),
        size(col("__hs")).cast("long").as("n_grams"),
        when(size(col("__hs")) === 0, lit(0L))
          .otherwise(size(col("__fp")).cast("long")).as("n_fp"),
        when(size(col("__hs")) === 0, lit(null).cast("string"))
          .otherwise(md5(concat_ws(",",
            transform(col("__fp"),
              s => concat(s.getField("p"), lit(":"), s.getField("h"))))))
          .as("fp_digest"))
  }

  /** DuckDB replay of [[fingerprints]] over `docsSql` rows
    * (doc_id, text): same grams, same 60-bit md5 hash, same
    * clipped-window rightmost-min selection, same digest. */
  def fingerprintsOracleSql(docsSql: String, k: Int, w: Int): String = {
    require(k >= 2, "oracle shingle comprehension needs k >= 2")
    s"""WITH d AS MATERIALIZED (SELECT doc_id, text FROM ($docsSql)),
       |tk AS MATERIALIZED (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
       |  FROM d WHERE length(trim(text)) > 0),
       |g AS MATERIALIZED (
       |  SELECT doc_id, i - 1 AS pos,
       |    CAST(CAST(('0x' || substr(md5('win:' ||
       |      array_to_string(ts[i:i + ${k - 1}], ' ')), 1, 15)) AS UBIGINT)
       |      AS BIGINT) AS h
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - ${k - 2})) AS i
       |        FROM tk WHERE len(ts) >= $k)),
       |m AS MATERIALIZED (SELECT doc_id, count(*) AS mg FROM g GROUP BY doc_id),
       |ws AS MATERIALIZED (
       |  SELECT g.doc_id, unnest(range(0, greatest(mg - $w, 0) + 1)) AS wstart
       |  FROM m g),
       |wmin AS MATERIALIZED (
       |  SELECT ws.doc_id, ws.wstart, min(g.h) AS mh
       |  FROM ws JOIN g ON g.doc_id = ws.doc_id
       |    AND g.pos BETWEEN ws.wstart AND ws.wstart + $w - 1
       |  GROUP BY ws.doc_id, ws.wstart),
       |pick AS MATERIALIZED (
       |  SELECT DISTINCT wmin.doc_id, max(g.pos) AS p, wmin.mh AS h
       |  FROM wmin JOIN g ON g.doc_id = wmin.doc_id AND g.h = wmin.mh
       |    AND g.pos BETWEEN wmin.wstart AND wmin.wstart + $w - 1
       |  GROUP BY wmin.doc_id, wmin.wstart, wmin.mh),
       |agg AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n_fp,
       |    md5(string_agg(p || ':' || h, ',' ORDER BY p)) AS fp_digest
       |  FROM (SELECT DISTINCT doc_id, p, h FROM pick) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(m.mg, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(agg.n_fp, 0) AS BIGINT) AS n_fp, agg.fp_digest
       |FROM d LEFT JOIN m ON m.doc_id = d.doc_id
       |LEFT JOIN agg ON agg.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
