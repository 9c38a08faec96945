package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — relational bulk-insert sink.
  *
  * The reference's only real sink is a warehouse table loaded via
  * batched inserts (incremental_loaders.py:100-109: `to_sql(...,
  * method="multi", chunksize=5000)`). Spark-native equivalent: the JDBC
  * writer, where every partition opens one connection and flushes
  * `batchsize`-row prepared-statement batches — the same batching
  * semantics, but cluster-parallel instead of single-process.
  *
  * 100 TB note: the parallelism is `df.rdd.getNumPartitions`
  * connections; coalesce to what the database can absorb (a thousand
  * executors hammering one Postgres is a DDoS, not a load). For
  * warehouse-scale loads prefer the parquet-staging path
  * ([[AtomicTableWriter]]) and a bulk COPY; this sink is the
  * operational path for modest dimension/fact increments, like the
  * reference's.
  *
  * Driver jars: the classpath must carry the target database's JDBC
  * driver (this repo's test uses the Derby embedded driver that ships
  * with Spark; Postgres/MySQL need their jar on `spark.jars`).
  */
object JdbcSink {

  /** Append (default) or overwrite `df` into `table` at `url`.
    *
    * @param batchSize rows per prepared-statement batch (the
    *   reference's chunksize=5000 default)
    * @param numPartitions cap on parallel connections; 0 = leave the
    *   DataFrame's partitioning as is
    * @param options extra JDBC options (driver, isolationLevel,
    *   truncate, ...) passed through verbatim
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                batchSize: Int = 5000, mode: String = "append",
                numPartitions: Int = 0,
                options: Map[String, String] = Map.empty): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val d = if (numPartitions > 0) df.coalesce(numPartitions) else df
    d.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .options(options)
      .mode(mode)
      .save()
  }

  /** Read a JDBC table back (round-trip checks, small dimension pulls). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()
}
