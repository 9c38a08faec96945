package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Incremental deduplication: dedup a NEW batch against an EXISTING
  * corpus index without touching the corpus text again — the shape a
  * production pipeline actually runs. At 100 TB you dedup yesterday's
  * corpus once, persist its index (a fingerprint + a 16-value MinHash
  * signature per doc — a few hundred bytes against kilobytes of text),
  * and every new batch joins that index instead of re-shingling
  * history.
  *
  * Verdict per batch doc:
  *  - `exact_dup`: content fingerprint (md5 of the text) already in
  *    the index; `dup_of` = the smallest such corpus id.
  *  - `near_dup`: an LSH band collision with an index doc whose
  *    signature agrees on ≥ `minMatches` of the `numHashes` positions
  *    (signature-estimated Jaccard — the verify needs ONLY the stored
  *    signatures, never the corpus text; that is what makes the index
  *    sufficient); `dup_of` = the smallest qualifying corpus id,
  *    `sig_match` = that pair's agreement count.
  *  - `new`: neither.
  *
  * Index maintenance is append-only: `buildIndex` of the accepted new
  * docs unions (or parquet-appends) onto the existing index — both
  * stages are per-row projections, so the daily cost scales with the
  * batch, not the corpus. Candidate generation is one equi-join on
  * (band, key); the batch side of that join is batch-sized, so the
  * shuffle moves the batch's band keys plus only the colliding slice
  * of the index.
  */
object IncrementalDedup {

  /** See [[Dedup]]: small inputs read as 1-2 partitions and would
    * serialize the hashing stage on one core. */
  private def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(p)
  }

  /** Corpus index: one row per doc — (id, fp, sig). `fp` is the md5
    * content fingerprint; `sig` the compiled MinHash signature (null
    * when the doc has fewer than `shingleSize` tokens — such docs can
    * still exact-match, never near-match). Persist this frame as
    * parquet and append each accepted batch. */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, numHashes: Int = 16): DataFrame =
    fanOut(corpus).select(
      col(idCol).as("id"),
      md5(col(textCol)).as("fp"),
      minhashSignature(array_distinct(wordShingles(col(textCol), shingleSize)),
        numHashes).as("sig"))

  /** (id, band, key) LSH band keys from an index frame's signatures. */
  private def bandKeysOf(index: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), bandKey(col("sig"), b, rowsPerBand).as("key"))
    }
    index.filter(col("sig").isNotNull)
      .select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
  }

  /** Dedup `batch` against `index` (a [[buildIndex]] frame, typically
    * read back from parquet). Returns one row per batch doc:
    * (id, verdict, dup_of, sig_match) — see the object doc for the
    * verdict rules. `numHashes = bands · rowsPerBand`.
    *
    * EAGER: checkpointing the batch index runs a Spark job at call
    * time in the default [[Materialize]] mode. */
  def dedupAgainst(batch: DataFrame, index: DataFrame, idCol: String,
                   textCol: String, shingleSize: Int = 3, bands: Int = 8,
                   rowsPerBand: Int = 2, minMatches: Int = 8): DataFrame = {
    val n = bands * rowsPerBand
    require(minMatches >= 1 && minMatches <= n,
      s"minMatches=$minMatches out of [1, $n]")
    // read thrice (fp join, band keys, signature verify) — compute once
    val b = Materialize.once(
      buildIndex(batch, idCol, textCol, shingleSize, n))

    val exact = b.join(
        index.groupBy("fp").agg(min("id").as("exact_of")), Seq("fp"), "left")
      .select(col("id"), col("exact_of"))

    val cands = bandKeysOf(b, bands, rowsPerBand)
      .join(bandKeysOf(index, bands, rowsPerBand)
        .withColumnRenamed("id", "idx_id"), Seq("band", "key"))
      .select(col("id"), col("idx_id")).distinct()
    // interpreted HOFs are fine here: the zip runs over candidate
    // PAIRS (band-collision survivors), not the corpus
    val scored = cands
      .join(b.select(col("id"), col("sig").as("sig_b")), Seq("id"))
      .join(index.select(col("id").as("idx_id"), col("sig").as("sig_i")), Seq("idx_id"))
      .withColumn("m",
        size(filter(zip_with(col("sig_b"), col("sig_i"), (x, y) => x === y),
          v => v)))
      .filter(col("m") >= minMatches)
    // min qualifying corpus id; idx_id is unique so the struct-min is
    // total and carries that pair's agreement count along
    val near = scored
      .groupBy("id")
      .agg(min(struct(col("idx_id"), col("m"))).as("nm"))
      .select(col("id"), col("nm.idx_id").as("near_of"), col("nm.m").as("near_m"))

    exact.join(near, Seq("id"), "left")
      .select(col("id"),
        when(col("exact_of").isNotNull, lit("exact_dup"))
          .when(col("near_of").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"),
        when(col("exact_of").isNull, col("near_m")).as("sig_match"))
  }
}
