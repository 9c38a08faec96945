package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Int8 scalar quantization of embedding columns — the standard 4×
  * compression for billion-vector ANN serving (each float32 dimension
  * maps to an 8-bit code against a per-dimension [min, max] codebook).
  *
  * Everything runs on the engine's exact integer plane: coordinates
  * first quantize to `floor(x·10⁶)` longs (the corpus-wide convention
  * — VectorFunctions.quantize), the codebook is per-dimension min/max
  * over those longs, and codes are `((xq−min)·255) div range` — pure
  * integer arithmetic, bit-identical in any engine, so code tables,
  * reconstruction errors, and code-space rankings all hash-match a
  * DuckDB replay.
  *
  * Scale shape: the codebook is one dims-wide aggregation (a
  * posexplode feeding `dims` groups — map-side combined, so the
  * shuffle is dims rows per partition); encoding is a PER-ROW
  * PROJECTION against the codebook embedded as literals (dims ≤ ~4k
  * by contract — a control-plane collect by design, same contract as
  * the IVF centroid literals); code-space search never shuffles the
  * corpus (queries broadcast, window top-k).
  */
object Int8Quant {

  /** Per-dimension codebook: `dim (1-based), min_q, max_q` over the
    * corpus's `floor(x·10⁶)` coordinates. One aggregation. */
  def codebook(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(VectorFunctions.quantize(col(vecCol)))
        .as(Seq("dim0", "xq")))
      .groupBy((col("dim0") + 1).cast("long").as("dim"))
      .agg(min("xq").as("min_q"), max("xq").as("max_q"))

  /** Codebook rows collected for literal embedding: (mins, ranges)
    * ordered by dimension; range is clamped to >= 1 so constant
    * dimensions encode as 0 without a division guard. Control-plane
    * by design: dims entries, NOT corpus-sized. */
  def collectCodebook(cb: DataFrame): (Array[Long], Array[Long]) = {
    val rows = cb.select("dim", "min_q", "max_q").orderBy("dim").collect()
    require(rows.length <= 4096,
      s"codebook has ${rows.length} dims; >4096 embeds too large a literal")
    (rows.map(_.getLong(1)),
      rows.map(r => math.max(r.getLong(2) - r.getLong(1), 1L)))
  }

  /** Int8 code array for one row's vector, against literal codebook
    * arrays. `floor` over the double quotient is exact here: numerator
    * ≤ ~5·10⁸ and true quotients are either exact or ≥ 2.5·10⁻⁷ away
    * from an integer (denominator ≤ 4·10⁶), far beyond the ~6·10⁻⁸
    * ulp at this magnitude — so it equals integer floor-division,
    * which is what the DuckDB oracle runs. */
  def encodeExpr(vec: Column, mins: Array[Long], ranges: Array[Long]): Column = {
    val mnLit = array(mins.map(lit): _*)
    val rgLit = array(ranges.map(lit): _*)
    val shifted = zip_with(VectorFunctions.quantize(vec), mnLit, (x, m) => x - m)
    zip_with(shifted, rgLit,
      (d, r) => floor((d * lit(255)).cast("double") / r.cast("double")).cast("long"))
  }

  /** Reconstruction-error report per dimension: `dim, min_q, max_q,
    * sum_codes, sum_abs_err` where err is `xq − (min + (code·range)
    * div 255)` — the end-to-end quantize→decode round-trip bound.
    * Integer throughout. */
  def reconReport(corpus: DataFrame, vecCol: String): DataFrame = {
    val cb = codebook(corpus, vecCol)
    val (mins, ranges) = collectCodebook(cb)
    val mnLit = array(mins.map(lit): _*)
    val rgLit = array(ranges.map(lit): _*)
    val codes = encodeExpr(col(vecCol), mins, ranges)
    val recon = zip_with(
      zip_with(codes, rgLit, (c, r) =>
        floor((c * r).cast("double") / lit(255.0)).cast("long")),
      mnLit, (d, m) => d + m)
    corpus
      .select(posexplode(arrays_zip(codes.as("c"),
        zip_with(VectorFunctions.quantize(col(vecCol)), recon, (x, rc) => x - rc)
          .as("e"))).as(Seq("dim0", "z")))
      .groupBy((col("dim0") + 1).cast("long").as("dim"))
      .agg(sum(col("z.c")).as("sum_codes"),
        sum(abs(col("z.e"))).as("sum_abs_err"))
      .join(cb, Seq("dim"))
      .select("dim", "min_q", "max_q", "sum_codes", "sum_abs_err")
      .orderBy("dim")
  }

  /** Quantization-quality audit: recall@k of the CODE-space ranking
    * against the exact full-precision integer-dot ranking, per query —
    * the number that decides whether 4× compression is free or is
    * costing retrieval quality. Both rankings are deterministic
    * (integer dots, id tie-breaks), so the recall table is exact and
    * oracle-checkable, not a sampled estimate. Two broadcast passes
    * over the corpus (queries ≪ corpus by contract), one count join.
    *
    * Output: `query_id, n_overlap, recall_ppm` (overlap·10⁶ div k). */
  def recallVsExact(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val approx = codeTopK(queries, corpus, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    def enc(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), VectorFunctions.quantize(col(vecCol)).as(v))
    val q = enc(queries, "query_id", "qq")
    val c = enc(corpus, "neighbor_id", "cv")
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    val exact = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", VectorFunctions.intDot(col("qq"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_overlap"))
      .join(q.select("query_id"), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr(s"(coalesce(n_overlap, 0L) * 1000000) div $k").as("recall_ppm"))
      .orderBy("query_id")
  }

  /** Exact top-k in CODE space: per query (broadcast), the k corpus
    * rows with the highest integer code dot product, ties broken by
    * neighbor id — the cheap first-pass ranking a quantized ANN
    * service runs before float re-scoring. Corpus never shuffles. */
  def codeTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    val (mins, ranges) = collectCodebook(codebook(corpus, vecCol))
    def enc(df: DataFrame, id: String, code: String) =
      df.select(col(idCol).as(id), encodeExpr(col(vecCol), mins, ranges).as(code))
    val q = enc(queries, "query_id", "qc")
    val c = enc(corpus, "neighbor_id", "cc")
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("code_dot").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("code_dot", VectorFunctions.intDot(col("qc"), col("cc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("code_dot"))
      .orderBy("query_id", "rank")
  }
}
