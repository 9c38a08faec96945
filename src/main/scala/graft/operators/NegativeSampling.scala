package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash

/** Deterministic negative sampling for contrastive training pairs via
  * a consistent-hash ring (public technique: consistent hashing /
  * rendezvous sampling): corpus rows sit on a ring at
  * `pos = h32("0:" ++ id)`; the j-th negative for anchor `a` is the
  * ring SUCCESSOR of `t = h32("neg<j>:" ++ a)` — the row with the
  * smallest `pos >= t`, wrapping to the ring's first row past the top.
  *
  * Because both placements are portable hashes, the sample is uniform
  * (ring gaps are exchangeable), reproducible on any engine or
  * partitioning, and needs NO random state — re-running training data
  * prep yields byte-identical negative sets (q100's DuckDB oracle
  * replays it row-for-row). Contrast `rand()`-based negatives, which
  * change with partitioning and retries.
  *
  * Scale shape: the successor search never sorts the corpus globally.
  * Ring and probes shuffle ONCE on their high-8-bit position bucket;
  * within a bucket one descending scan carries the nearest-above ring
  * row onto each probe (the as-of union-scan trick, q46's operator,
  * pointed at hash space instead of time). Probes whose bucket tail is
  * empty resolve against the per-bucket first-row table — at most 256
  * rows, broadcast — which also provides the wrap-around row. Ties on
  * equal position resolve to the smallest id on any layout.
  */
object NegativeSampling {

  private val BucketShift = 24 // 2^32 positions -> 256 buckets

  /** (anchor_id, j, negative_id, negative_pos) for j in 1..k.
    * `corpus` provides the ring (all rows, by `idCol`); `anchors` the
    * probe rows (often a filtered subset of the corpus). Ids must be
    * integral (cast to long); null ids are dropped from both sides.
    * The ring must be non-empty. */
  def hashRingNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
                        k: Int, seed: Int = 0): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = corpus.sparkSession
    val ring = corpus.select(col(idCol).cast("long").as("__rid"))
      .filter(col("__rid").isNotNull)
      .withColumn("__pos", portableHash(concat(lit(s"$seed:"), col("__rid").cast("string"))))
      .withColumn("__bucket", expr(s"__pos div ${1L << BucketShift}"))
    val probes = anchors.select(col(idCol).cast("long").as("anchor_id"))
      .filter(col("anchor_id").isNotNull)
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("__target",
        portableHash(concat(lit("neg"), col("j").cast("string"), lit(s":$seed:"),
          col("anchor_id").cast("string"))))
      .withColumn("__bucket", expr(s"__target div ${1L << BucketShift}"))

    // per-bucket first rows: the fallback for empty bucket tails and the
    // wrap-around row. Control-plane sized (<= 256 rows).
    val bucketFirst = ring.groupBy("__bucket")
      .agg(min(struct(col("__pos"), col("__rid"))).as("__first"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))))
      .sortBy(_._1)
    require(bucketFirst.nonEmpty, "hashRingNegatives: empty ring")
    val globalFirst = bucketFirst.head._2
    // nextAfter(b) = first ring row of the nearest non-empty bucket > b,
    // wrapping to the global first — precomputed for every probe bucket
    val nBuckets = (1L << (32 - BucketShift)).toInt
    val nextAfter: Seq[(Long, Long, Long)] = (0 until nBuckets).map { b =>
      bucketFirst.find(_._1 > b).map(_._2).getOrElse(globalFirst) match {
        case (pos, rid) => (b.toLong, rid, pos)
      }
    }
    import spark.implicits._
    val fallback = broadcast(nextAfter
      .toDF("__bucket", "__fb_id", "__fb_pos"))

    // union-scan within each bucket, DESCENDING by position: the carried
    // last ring row at a probe is the smallest pos >= target. Ring rows
    // sort before probes at equal position (inclusive >=); equal-pos
    // ring rows scan in descending id so the carried survivor is the
    // minimum id — both invariant to partitioning.
    val ringSide = ring.select(col("__bucket"), col("__pos").as("__ord"),
      lit(0).as("__side"), col("__rid"),
      lit(null).cast("long").as("anchor_id"), lit(null).cast("int").as("j"))
    val probeSide = probes.select(col("__bucket"), col("__target").as("__ord"),
      lit(1).as("__side"), lit(null).cast("long").as("__rid"),
      col("anchor_id"), col("j"))
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("__ord").desc, col("__side").asc, col("__rid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ringSide.unionByName(probeSide)
      .withColumn("__succ_id", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__succ_pos", last(when(col("__side") === 0, col("__ord")),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .join(fallback, Seq("__bucket"), "left")
      .select(col("anchor_id"), col("j"),
        coalesce(col("__succ_id"), col("__fb_id")).as("negative_id"),
        coalesce(col("__succ_pos"), col("__fb_pos")).as("negative_pos"))
  }
}
