package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CdcCuts

/** Content-defined chunking + corpus-wide chunk dedup — the storage-
  * side deduplication that backs 100 TB training-data lakes (LBFS,
  * Muthitacharoen et al. SOSP'01; the FastCDC line): split every
  * document at content-determined boundaries, hash the chunks, and
  * count how many documents share each chunk. Unlike fixed-size
  * blocking, boundaries RESYNCHRONIZE after insertions — a document
  * that embeds a shifted copy of shared content still yields the
  * shared chunks (spec-pinned), which is the entire dedup win.
  *
  * 100 TB shape: chunking is a per-row compiled projection
  * ([[org.apache.spark.sql.graft.CdcCuts]], O(len) digests per doc);
  * the ONLY exchange is the group-by on chunk hash — the irreducible
  * dedup shuffle, keyed on uniformly-distributed digests (no skew by
  * construction; a pathological boilerplate chunk is ONE hot hash
  * group whose aggregate is a partial-agg count, not a row fan-out).
  */
object Cdc {

  /** Explode documents into chunks with corpus-wide sharing counts.
    * @return (idCol, chunk_idx, start, chunk_len, chunk_md5, n_docs) —
    *         `start` 0-based, `n_docs` = distinct documents containing
    *         an identical chunk (>= 1). */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 window: Int = 8, divisor: Int = 16, minLen: Int = 8,
                 maxLen: Int = 64): DataFrame = {
    val chunkRows = chunks(docs, idCol, textCol, window, divisor, minLen, maxLen)
    val sharing = chunkRows.groupBy("chunk_md5")
      .agg(countDistinct(col(idCol)).as("n_docs"))
    chunkRows.join(sharing, Seq("chunk_md5"))
      .select(col(idCol), col("chunk_idx"), col("start"), col("chunk_len"),
        col("chunk_md5"), col("n_docs"))
  }

  /** The per-document chunk rows alone (the compiled projection stage
    * of [[chunkDedup]], shared with [[CdcIndex.build]]). */
  private[graft] def chunks(docs: DataFrame, idCol: String,
                            textCol: String, window: Int, divisor: Int,
                            minLen: Int, maxLen: Int): DataFrame = {
    val ends = CdcCuts(col(textCol), window, divisor, minLen, maxLen)
    // fan the rolling-hash cut scan + per-chunk md5 wide (the Dedup
    // fanOut pattern): a sub-split-size corpus file otherwise runs this
    // compute-heavy projection as ONE task — and chunkDedup's sharing
    // join evaluates it on both sides
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), col(textCol).as("__s"), ends.as("__ends"))
      .withColumn("__starts",
        when(size(col("__ends")) === 0, array().cast("array<int>"))
          .otherwise(concat(array(lit(0)),
            slice(col("__ends"), lit(1), size(col("__ends")) - 1))))
      .select(col(idCol), col("__s"),
        posexplode(arrays_zip(col("__starts").as("s"), col("__ends").as("e")))
          .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.s").cast("long").as("start"),
        (col("__c.e") - col("__c.s")).cast("long").as("chunk_len"),
        md5(expr("substring(__s, __c.s + 1, __c.e - __c.s)")).as("chunk_md5"))
  }

  /** DuckDB replay of [[chunkDedup]]: `docsSql` must yield (id, s).
    * Boundary candidates vectorize (one hash per eligible position);
    * the sequential cut selection recurses over CUTS only (~len/divisor
    * steps per doc), with the min-candidate lookup decorrelated by
    * DuckDB. */
  def chunkDedupOracleSql(docsSql: String, idOut: String, window: Int = 8,
                          divisor: Int = 16, minLen: Int = 8,
                          maxLen: Int = 64): String = {
    val hx = (e: String) =>
      s"CAST(CAST(('0x' || substr(md5($e), 1, 8)) AS UBIGINT) AS BIGINT)"
    s"""WITH RECURSIVE
       |d AS (SELECT id, s, length(s) AS len FROM ($docsSql) WHERE s IS NOT NULL),
       |cand AS (SELECT id, p FROM (
       |    SELECT id, CAST(unnest(range($window, len + 1)) AS BIGINT) AS p, s
       |    FROM d) t
       |  WHERE ${hx(s"substr(t.s, CAST(t.p AS INT) - $window + 1, $window)")}
       |    % $divisor = 0),
       |cuts AS (
       |  SELECT id, len, CAST(0 AS BIGINT) AS cut, CAST(-1 AS BIGINT) AS idx,
       |    CAST(0 AS BIGINT) AS st
       |  FROM d WHERE len > 0
       |  UNION ALL
       |  SELECT id, len,
       |    coalesce((SELECT min(p) FROM cand
       |       WHERE cand.id = cuts.id AND p >= cuts.cut + $minLen
       |         AND p <= least(cuts.cut + $maxLen, cuts.len)),
       |      least(cuts.cut + $maxLen, cuts.len)) AS cut,
       |    idx + 1 AS idx, cuts.cut AS st
       |  FROM cuts WHERE cut < len),
       |chunks AS (SELECT c.id, c.idx, c.st, c.cut - c.st AS clen,
       |    md5(substr(d.s, CAST(c.st AS INT) + 1, CAST(c.cut - c.st AS INT)))
       |      AS chash
       |  FROM cuts c JOIN d USING (id) WHERE c.idx >= 0),
       |sharing AS (SELECT chash, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
       |  FROM chunks GROUP BY 1)
       |SELECT c.id AS $idOut, c.idx AS chunk_idx, c.st AS start,
       |  c.clen AS chunk_len, c.chash AS chunk_md5, s.n_docs
       |FROM chunks c JOIN sharing s USING (chash)
       |ORDER BY $idOut, chunk_idx""".stripMargin
  }
}
