package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *    set against the corpus, per-query top-k window. Scales linearly in
  *    corpus size with no shuffle of the corpus itself.
  *  - [[ivfTopK]]: IVF scale path — k-means coarse quantizer (MLlib),
  *    corpus bucketed by nearest centroid, queries probe only
  *    `nProbe` nearest cells. Corpus-side work drops by
  *    ~nProbe/nCells; the bucketed corpus can be written partitioned by
  *    cell so probes prune partitions at read time.
  *  - [[srpTopK]]: LSH alternative when training a quantizer is
  *    undesirable — multi-table sign-random-projection buckets.
  *
  * Results are deterministic: ranking on rounded similarity with id
  * tie-break.
  */
object Similarity {

  /** See Dedup.fanOut: don't inherit a small file's split count for
    * O(pairs) compute stages. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact top-k neighbors for each query vector (excluding self-match
    * on equal ids). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = fanOut(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Exact all-pairs above a cosine threshold (small corpora / testing). */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val v = fanOut(df).select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** IVF (inverted-file) ANN: train a k-means coarse quantizer, assign
    * the corpus to cells once, then search only the `nProbe` cells
    * nearest each query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 3,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession

    val train = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray)
    }
    val centDf = spark.createDataFrame(centroids).toDF("cell", "centroid")

    // assign corpus rows to their nearest cell (one broadcast join pass)
    val c = fanOut(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val assigned = c.crossJoin(broadcast(centDf))
      .withColumn("dist", l2Distance(col("cv"), col("centroid")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("neighbor_id")).orderBy(col("dist"), col("cell"))))
      .filter(col("rk") === 1)
      .select(col("neighbor_id"), col("cv"), col("cell"))

    // each query probes its nProbe nearest cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("dist", l2Distance(col("qv"), col("centroid")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cell"))))
      .filter(col("rk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Multi-table SRP-LSH top-k: union candidates from `tables`
    * independent bucketings, then exact re-rank. */
  def srpTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 10, tables: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = fanOut(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val cands = (0 until tables).map { t =>
      val qb = q.withColumn("bucket", srpBucket(col("qv"), planes, seed = t))
      val cb = c.withColumn("bucket", srpBucket(col("cv"), planes, seed = t))
      qb.join(cb, Seq("bucket")).select(col("query_id"), col("qv"),
        col("neighbor_id"), col("cv"))
    }.reduce(_.unionByName(_)).distinct()
    val scored = cands
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
