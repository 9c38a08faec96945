package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Tuned for the driver's `local[32]` single-JVM harness but every knob is
  * chosen to also be the right default on a real multi-executor cluster:
  * AQE re-plans shuffles at runtime (partition coalescing + skew-join
  * splitting), shuffle partitions start at 32 (overridable; on a large
  * cluster AQE coalesces from a higher initial number), and broadcast
  * joins stay enabled for dimension tables.
  */
object GraftSession {
  def builder(master: String = "local[*]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // full SQL surface (20 graft_* functions + long_array_dot), the
      // RangeBinJoin optimizer rewrite, and the TopKPerKey
      // planner strategy, wired at session build
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md). */
object Tables {
  import org.apache.spark.sql.DataFrame
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    // events.parquet carries TIMESTAMP(NANOS), which the vectorized
    // reader rejects — route through the ns-safe reader (raw INT64 ts
    // truncated to micros, matching DuckDB's CAST semantics)
    if (name == "events") graft.queries.EtlQueries.events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
}
