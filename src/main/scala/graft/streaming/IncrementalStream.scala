package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import graft.operators.MergeOps
import graft.sources.AtomicTableWriter

/** Structured Streaming shape of the reference's incremental pipeline
  * (SURVEY §2.9): the daily "pull since watermark → flatten → upsert"
  * loop becomes file-arrival streaming with `Trigger.AvailableNow` and
  * a `foreachBatch` merge. The reference's overlap-lookback rerun
  * safety maps to the same property here: the merge is an idempotent
  * upsert, so replayed files cannot duplicate rows.
  *
  * Scale notes: the file source checkpoints processed-file state; each
  * micro-batch shuffles only batch-sized data for the merge anti-join.
  * Watermarked windowed aggregation bounds state size on unbounded
  * streams.
  */
object IncrementalStream {

  /** Bronze stream: line-delimited JSON nodes (the splittable bulk
    * format) arriving in a directory. */
  def streamJsonl(spark: SparkSession, node: StructType, path: String): DataFrame =
    spark.readStream.schema(node).json(path)

  /** Merge each micro-batch into a gold table: flatten → dedup within
    * batch → upsert. Returns the started query; AvailableNow drains
    * what exists, then stops (the reference's daily batch semantics). */
  def upsertSink(stream: DataFrame, flatten: DataFrame => DataFrame,
                 goldPath: String, keys: Seq[String], checkpoint: String,
                 latestBy: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val staged0 = flatten(batch)
        // a batch can carry several versions of one key; keep latest,
        // with the remaining columns as a total tie-break order (equal
        // timestamps must not pick a partition-dependent survivor)
        val tieBreak = staged0.columns
          .filterNot(keys.contains).filterNot(_ == latestBy)
          .map(c => col(c).desc).toSeq
        val staged = MergeOps.dedupLatest(staged0,
          keys.map(col), col(latestBy).desc +: tieBreak)
        val merged = AtomicTableWriter.read(batch.sparkSession, goldPath) match {
          case Some(target) => MergeOps.upsert(target, staged, keys)
          case None => staged
        }
        AtomicTableWriter.overwrite(merged, goldPath)
      }
      .start()

  /** Watermarked tumbling-window aggregation over an event stream —
    * the streaming twin of EtlQueries.q17. State for windows older than
    * the watermark is dropped, bounding memory on unbounded input. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Streaming exact dedup — the streaming twin of `Dedup.exact`: drop
    * rows whose content fingerprint was already seen within the
    * watermark horizon (`dropDuplicatesWithinWatermark`, so the
    * dedup-key state store is bounded on unbounded streams — an
    * unwindowed dropDuplicates would grow state forever). Replayed or
    * duplicated documents inside the horizon are emitted once. */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String): DataFrame =
    docs
      .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming curation — the continuous twin of q53's batch pipeline:
    * quality gate (pure projection) → PII scrub (projection) →
    * exact dedup bounded by the watermark horizon → reproducible split
    * assignment (hash membership — stream-safe: no RNG, no global
    * state; the same doc gets the same split on any replay). Documents
    * arriving as an unbounded stream come out train/val-labeled,
    * deduped, scrubbed — append-mode compatible (every operator here is
    * projection or watermark-bounded). */
  def curationStream(docs: DataFrame, idCol: String, tsCol: String,
                     textCol: String, watermark: String,
                     minQuality: Double = 0.5): DataFrame = {
    val gated = docs
      .filter(graft.functions.TextFunctions.qualityScore(col(textCol)) > minQuality)
      .transform(graft.operators.QualityOps.scrubPii(_, textCol))
    graft.operators.Sampling.assignSplit(
      gated
        .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
        .withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("__fp")
        .drop("__fp"),
      idCol, Seq("train" -> 0.9, "val" -> 0.1), seed = 11)
  }

  /** Streaming incremental dedup: verdict every arriving doc against a
    * STATIC corpus index ([[graft.operators.IncrementalDedup]]) via
    * foreachBatch — each micro-batch IS the daily batch shrunk to
    * minutes, so the batch operator (and its oracle-verified
    * semantics) applies unchanged; the index is read once per batch
    * from wherever it is persisted. `sink` receives the verdict frame
    * (id, verdict, dup_of, sig_match) per batch — typically an
    * append to the accepted-docs table plus an index append of the
    * `new` rows so later batches catch repeats. */
  def incrementalDedupSink(docs: DataFrame, index: DataFrame, idCol: String,
                           textCol: String, checkpoint: String,
                           minMatches: Int = 8)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.IncrementalDedup.dedupAgainst(
          batch, index, idCol, textCol, minMatches = minMatches))
      }
      .start()

  /** One maintained-rollup step with an exactly-once guard, exposed
    * for direct testing and reuse by [[maintainedRollupSink]].
    *
    * Additive aggregation is NOT naturally idempotent (replaying a
    * micro-batch after a crash would double-count, unlike the upsert
    * sinks), so the applied batch id rides IN the state table as a
    * constant `__batch_id` column — it commits atomically with the
    * data, and a batch at or below the recorded id is skipped. */
  /** Highest applied batch id recorded in a rollup state table, None
    * when the table exists but holds zero rows (an empty first
    * micro-batch writes an empty rollup — `max` over it is NULL, and
    * treating that as "no batch applied" keeps the sink alive instead
    * of NPE-wedging every later batch). */
  private def maxBatchId(state: DataFrame): Option[Long] = {
    val row = state.select(max(col("__batch_id"))).first()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  def applyRollupBatch(batch: DataFrame, batchId: Long, statePath: String,
                       keys: Seq[String],
                       aggs: Seq[(String, org.apache.spark.sql.Column,
                         org.apache.spark.sql.Column)]): Unit = {
    val prior = AtomicTableWriter.read(batch.sparkSession, statePath)
    val applied = prior.flatMap(maxBatchId)
    if (applied.exists(_ >= batchId)) return // replay: already folded in
    val next = prior match {
      case Some(st) => graft.operators.MaterializedAgg.maintain(
        st.drop("__batch_id"), batch, keys, aggs)
      case None => batch.groupBy(keys.map(col): _*)
        .agg(aggs.head._2.as(aggs.head._1),
          aggs.tail.map { case (n, a, _) => a.as(n) }: _*)
    }
    AtomicTableWriter.overwrite(next.withColumn("__batch_id", lit(batchId)),
      statePath)
  }

  /** [[applyRollupBatch]] with the state in a
    * [[graft.sources.VersionedTable]]: every applied batch commits a
    * SNAPSHOT, so the maintained aggregate is time-travelable — "the
    * rollup as of batch N" stays queryable while `keepVersions` lasts,
    * and the crash-safe pointer commit replaces the atomic swap. The
    * same `__batch_id` exactly-once guard applies; a skipped replay
    * commits no version. */
  def applyVersionedRollupBatch(batch: DataFrame, batchId: Long,
                                tablePath: String, keys: Seq[String],
                                aggs: Seq[(String, org.apache.spark.sql.Column,
                                  org.apache.spark.sql.Column)],
                                keepVersions: Int = 3): Unit = {
    import graft.sources.VersionedTable
    val prior = VersionedTable.read(batch.sparkSession, tablePath)
    val applied = prior.flatMap(maxBatchId)
    if (applied.exists(_ >= batchId)) return // replay: already folded in
    val next = prior match {
      case Some(st) => graft.operators.MaterializedAgg.maintain(
        st.drop("__batch_id"), batch, keys, aggs)
      case None => batch.groupBy(keys.map(col): _*)
        .agg(aggs.head._2.as(aggs.head._1),
          aggs.tail.map { case (n, a, _) => a.as(n) }: _*)
    }
    VersionedTable.write(next.withColumn("__batch_id", lit(batchId)),
      tablePath, keepVersions)
  }

  /** Streaming materialized-aggregate maintenance — the streaming twin
    * of q94: each micro-batch folds into the persisted rollup via
    * [[graft.operators.MaterializedAgg.maintain]], moving
    * `O(state + batch)` rows per trigger, never the fact history. */
  def maintainedRollupSink(stream: DataFrame, statePath: String,
                           keys: Seq[String],
                           aggs: Seq[(String, org.apache.spark.sql.Column,
                             org.apache.spark.sql.Column)],
                           checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyRollupBatch(batch, id, statePath, keys, aggs)
      }
      .start()

  /** Fold one micro-batch into the persistent (day, bucket, register)
    * HLL state behind [[graft.operators.Sketches.slidingDistinct]] —
    * register merge is MAX per (day, bucket), so a fold is idempotent
    * in VALUE; the `__batch_id` guard still skips replayed batches to
    * keep the atomic-swap count bounded. State size is days × 2^b
    * regardless of event volume, and
    * [[slidingDistinctFromState]] answers the sliding-cardinality
    * query from it without touching raw events. */
  def applyHllRegisterBatch(batch: DataFrame, batchId: Long, statePath: String,
                            dayCol: String, keyCol: String, b: Int): Unit = {
    val prior = AtomicTableWriter.read(batch.sparkSession, statePath)
    val applied = prior.flatMap(maxBatchId)
    if (applied.exists(_ >= batchId)) return // replay: already folded in
    val fresh = graft.operators.Sketches.dailyRegisters(batch, dayCol, keyCol, b)
    val next = prior match {
      case Some(st) => st.drop("__batch_id").union(fresh)
        .groupBy("day", "bucket").agg(max(col("r")).as("r"))
      case None => fresh
    }
    AtomicTableWriter.overwrite(next.withColumn("__batch_id", lit(batchId)),
      statePath)
  }

  /** [[applyHllRegisterBatch]] as an AvailableNow sink. */
  def hllRegisterSink(stream: DataFrame, statePath: String,
                      dayCol: String, keyCol: String, b: Int,
                      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyHllRegisterBatch(batch, id, statePath, dayCol, keyCol, b)
      }
      .start()

  /** The q135 sliding-distinct answer from maintained register state:
    * one row per day present in the state, estimates identical to the
    * batch [[graft.operators.Sketches.slidingDistinct]] over the same
    * events (register max-merge is associative and commutative). */
  def slidingDistinctFromState(spark: org.apache.spark.sql.SparkSession,
                               statePath: String, b: Int,
                               windowDays: Int): DataFrame = {
    val st = AtomicTableWriter.read(spark, statePath)
      .getOrElse(sys.error(s"no HLL register state at $statePath"))
      .drop("__batch_id")
    graft.operators.Sketches.slidingFromRegisters(
      st, st.select(col("day")).distinct(), b, windowDays)
  }

  /** Fold one micro-batch of NEW documents into a persistent BM25
    * inverted index — the streaming twin of
    * [[graft.operators.Bm25Index.build]]. Postings land under
    * `postings/__batch=<id>/bucket=N/` via dynamic partition
    * overwrite, so a crash-replayed batch REPLACES its own partitions
    * instead of double-appending; the (n, sumdl) stats sidecar folds
    * the batch's delta under the same `__batch_id` guard as the
    * rollup sinks. Write order is postings-then-stats: a crash
    * between them replays into an identical postings overwrite and a
    * single stats fold — exactly-once either way.
    * [[graft.operators.Bm25Index.search]] reads the maintained layout
    * unchanged (bucket pruning works through the extra __batch partition
    * level). Contract: doc ids are append-only across batches — an
    * updated doc needs the batch twin's full rebuild of its buckets. */
  def applyBm25IndexBatch(batch: DataFrame, batchId: Long, indexPath: String,
                          idCol: String, textCol: String,
                          nBuckets: Int): Unit = {
    import graft.functions.TextFunctions
    val spark = batch.sparkSession
    val prior = AtomicTableWriter.read(spark, s"$indexPath/stats")
    if (prior.flatMap(maxBatchId).exists(_ >= batchId)) return // replay
    // the stats sidecar pins the postings' bucket modulus; folding a
    // batch with a different nBuckets would scatter the same term
    // across two layouts and silently break search-side pruning
    prior.filter(_.columns.contains("n_buckets")).foreach { st =>
      val pinned = st.select("n_buckets").head().getInt(0)
      require(pinned == nBuckets,
        s"applyBm25IndexBatch: index at $indexPath was built with " +
          s"n_buckets=$pinned; refusing to fold a batch at nBuckets=$nBuckets")
    }
    batch.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", TextFunctions.portableHash(col("term")) % nBuckets)
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch", "bucket")
      .parquet(s"$indexPath/postings")
    val delta = batch.agg(
      count(lit(1)).as("n"),
      coalesce(sum(TextFunctions.tokenCount(col(textCol)).cast("long")),
        lit(0L)).as("sumdl"))
    val next = prior match {
      case Some(st) => delta.unionByName(st.select("n", "sumdl"))
        .agg(sum("n").as("n"), sum("sumdl").as("sumdl"))
      case None => delta
    }
    AtomicTableWriter.overwrite(
      next.withColumn("__batch_id", lit(batchId))
        .withColumn("n_buckets", lit(nBuckets)), s"$indexPath/stats")
  }

  /** Streaming BM25 index maintenance: AvailableNow micro-batches of
    * new documents fold into the persistent inverted index via
    * [[applyBm25IndexBatch]]. */
  def bm25IndexSink(docs: DataFrame, idCol: String, textCol: String,
                    indexPath: String, nBuckets: Int,
                    checkpoint: String,
                    compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBm25IndexBatch(batch, id, indexPath, idCol, textCol, nBuckets)
        // periodic maintenance: fold the per-batch partition layers
        // back to one (file count otherwise grows per batch forever);
        // compaction is crash-safe and value-neutral, so running it
        // inside the sink cannot break exactly-once
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
          graft.operators.Bm25Index.compact(batch.sparkSession, indexPath)
        ()
      }
      .start()

  /** Fold one micro-batch of new documents into the persistent CDC
    * chunk store ([[graft.operators.CdcIndex]]): chunk the batch with
    * the SAME content-defined boundaries as the batch build, land one
    * `__batch=<id>/bucket=N/` partition tree, and advance the stats
    * sidecar under the `__batch_id` replay guard. The sidecar pins
    * ALL chunking parameters plus the bucket modulus — folding a
    * delta chunked differently would store incomparable boundaries
    * and silently destroy dedup hits, so a mismatch refuses loudly. */
  def applyCdcIndexBatch(batch: DataFrame, batchId: Long, indexPath: String,
                         idCol: String, textCol: String, nBuckets: Int,
                         window: Int = 8, divisor: Int = 16,
                         minLen: Int = 8, maxLen: Int = 64): Unit = {
    val spark = batch.sparkSession
    val prior = AtomicTableWriter.read(spark, s"$indexPath/stats")
    if (prior.flatMap(maxBatchId).exists(_ >= batchId)) return // replay
    prior.filter(_.columns.contains("n_buckets")).foreach { st =>
      val r = st.select("n_buckets", "window", "divisor", "min_len",
        "max_len").head()
      val pinned = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))
      require(pinned == ((nBuckets, window, divisor, minLen, maxLen)),
        s"applyCdcIndexBatch: index at $indexPath pinned " +
          s"(n_buckets, window, divisor, min_len, max_len)=$pinned; " +
          s"refusing to fold a batch at " +
          s"(${(nBuckets, window, divisor, minLen, maxLen)})")
    }
    graft.operators.Cdc.chunks(
        batch.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id", textCol, window, divisor, minLen, maxLen)
      .withColumn("bucket",
        graft.functions.TextFunctions.portableHash(col("chunk_md5")) % nBuckets)
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch", "bucket")
      .parquet(s"$indexPath/postings")
    val delta = batch.agg(count(lit(1)).as("n"))
    val next = prior match {
      case Some(st) => delta.unionByName(st.select("n"))
        .agg(sum("n").as("n"))
      case None => delta
    }
    AtomicTableWriter.overwrite(
      next.withColumn("__batch_id", lit(batchId))
        .withColumn("n_buckets", lit(nBuckets))
        .withColumn("window", lit(window))
        .withColumn("divisor", lit(divisor))
        .withColumn("min_len", lit(minLen))
        .withColumn("max_len", lit(maxLen)), s"$indexPath/stats")
  }

  /** Streaming CDC chunk-store maintenance: AvailableNow micro-batches
    * of new documents fold via [[applyCdcIndexBatch]]; periodic layer
    * compaction as in [[bm25IndexSink]] (crash-safe, value-neutral). */
  def cdcIndexSink(docs: DataFrame, idCol: String, textCol: String,
                   indexPath: String, nBuckets: Int, checkpoint: String,
                   window: Int = 8, divisor: Int = 16, minLen: Int = 8,
                   maxLen: Int = 64,
                   compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyCdcIndexBatch(batch, id, indexPath, idCol, textCol, nBuckets,
          window, divisor, minLen, maxLen)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
          graft.operators.CdcIndex.compact(batch.sparkSession, indexPath)
        ()
      }
      .start()

  /** Log one micro-batch's PSI drift against a PINNED reference
    * snapshot — the streaming twin of q122: each arriving batch is
    * scored with the same [[graft.operators.Drift.psiByBucket]] as the
    * batch monitor (identical integer per-bucket contributions), and
    * its per-bucket rows land in a persistent drift log stamped with
    * the micro-batch id, so the log answers both "PSI now" and "PSI
    * trajectory across batches". Appending a log row is NOT naturally
    * idempotent, so the applied batch id rides in the log itself under
    * the same `__batch_id` guard as the rollup sinks — a
    * crash-replayed batch is a no-op. An empty micro-batch still logs
    * its reference-side buckets (c_cur = 0), which both records the
    * "everything vanished" drift signal and advances the guard.
    *
    * Scale shape: the log holds ≤ `buckets` rows per applied batch —
    * control-plane-sized by construction — and the atomic swap
    * rewrites O(batches · buckets) monitoring rows per trigger, never
    * anything corpus-sized; the reference snapshot is re-scanned once
    * per batch, so pin it to a pre-aggregated or sampled frame if the
    * full corpus is large. */
  def applyDriftBatch(batch: DataFrame, batchId: Long, reference: DataFrame,
                      statePath: String, textCol: String,
                      buckets: Int = 256): Unit = {
    val prior = AtomicTableWriter.read(batch.sparkSession, statePath)
    if (prior.flatMap(maxBatchId).exists(_ >= batchId)) return // replay
    val fresh = graft.operators.Drift
      .psiByBucket(reference, batch, textCol, buckets)
      .withColumn("__batch_id", lit(batchId))
    AtomicTableWriter.overwrite(
      prior.map(_.unionByName(fresh)).getOrElse(fresh), statePath)
  }

  /** [[applyDriftBatch]] as an AvailableNow sink. */
  def driftSink(stream: DataFrame, reference: DataFrame, statePath: String,
                textCol: String, buckets: Int,
                checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyDriftBatch(batch, id, reference, statePath, textCol, buckets)
      }
      .start()

  /** Fold one micro-batch of (unit, label) ratings into the persistent
    * Krippendorff count state — the sufficient statistic for α is the
    * (unit, label, n) rating-count table, ADDITIVE in ratings, so
    * maintenance is one batch-sized count plus a state-sized merge,
    * never a re-scan of rating history (the q94 rollup discipline
    * applied to an agreement coefficient). State is count-table-sized:
    * O(units × labels-actually-used), independent of rating volume. */
  def applyKrippendorffBatch(batch: DataFrame, batchId: Long,
                             statePath: String, unitCol: String,
                             labelCol: String): Unit = {
    val prior = AtomicTableWriter.read(batch.sparkSession, statePath)
    if (prior.flatMap(maxBatchId).exists(_ >= batchId)) return // replay
    val fresh = batch
      .select(col(unitCol).as("__u"), col(labelCol).cast("string").as("__l"))
      .where(col("__u").isNotNull && col("__l").isNotNull)
      .groupBy("__u", "__l").agg(count(lit(1)).as("__n"))
    val merged = prior match {
      case Some(st) => st.drop("__batch_id").unionByName(fresh)
        .groupBy("__u", "__l").agg(sum(col("__n")).as("__n"))
      case None => fresh
    }
    AtomicTableWriter.overwrite(
      merged.withColumn("__batch_id", lit(batchId)), statePath)
  }

  /** [[applyKrippendorffBatch]] as an AvailableNow sink. */
  def krippendorffSink(stream: DataFrame, statePath: String, unitCol: String,
                       labelCol: String,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyKrippendorffBatch(batch, id, statePath, unitCol, labelCol)
      }
      .start()

  /** Krippendorff's α from the maintained count state — identical
    * arithmetic (and result) to running
    * [[graft.operators.LabelOps.krippendorffAlpha]] over the full
    * rating history, from state that never re-reads that history. */
  def krippendorffFromState(spark: SparkSession, statePath: String): DataFrame =
    graft.operators.LabelOps.krippendorffFromCounts(
      AtomicTableWriter.read(spark, statePath)
        .getOrElse(sys.error(s"no krippendorff state at $statePath"))
        .drop("__batch_id"))

  /** The drift trajectory from maintained log state: one row per
    * applied batch with the corpus-level PSI (sum of the exact integer
    * per-bucket contributions — `psi = psi_q_sum / 10⁹`). */
  def driftTrajectory(spark: SparkSession, statePath: String): DataFrame =
    AtomicTableWriter.read(spark, statePath)
      .getOrElse(sys.error(s"no drift log at $statePath"))
      .groupBy("__batch_id")
      .agg(sum(col("psi_q")).as("psi_q_sum"))
      .orderBy("__batch_id")

  /** Streaming SCD2 maintenance: each micro-batch of change events
    * merges into the persisted history via
    * [[graft.operators.Scd2.merge]] — closed versions never rewrite,
    * cost scales with the batch plus touched keys' open rows, and the
    * merge's below-horizon replay drop makes crash-replayed batches a
    * no-op (no extra batch-id guard needed). */
  def scd2Sink(stream: DataFrame, historyPath: String, keyCols: Seq[String],
               tsCol: String, tieBreak: String, attrCols: Seq[String],
               checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = AtomicTableWriter.read(batch.sparkSession, historyPath) match {
          case Some(history) =>
            graft.operators.Scd2.merge(history, batch, keyCols, tsCol,
              tieBreak, attrCols)
          case None =>
            graft.operators.Scd2.fromChangeLog(batch, keyCols, tsCol,
              tieBreak, attrCols)
        }
        AtomicTableWriter.overwrite(merged, historyPath)
      }
      .start()

  /** Streaming count-min: [[graft.operators.Sketches.countMin]] is
    * stream-safe as written — an update-mode aggregation whose state
    * is bounded BY CONSTRUCTION (≤ depth·width counter rows, ever),
    * the sketch property doing the watermark's job. The emitted
    * counter table merges across restarts/streams with a groupBy-sum,
    * same as the batch sketch. */
  def cmsStream(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    graft.operators.Sketches.countMin(keys, keyCol, depth, width)

  case class TokenWeight(shard: Int, token: String, minCount: Long)

  /** Streaming heavy hitters: Misra–Gries sketches as
    * `flatMapGroupsWithState` state, sharded by token hash. Tokens hash
    * to exactly ONE shard, so a globally frequent token accumulates in
    * a single shard's sketch and the per-shard MG guarantee applies to
    * it directly; total state is bounded at `shards × capacity`
    * entries no matter how long the stream runs — the property a
    * naive streaming `groupBy(token).count()` (vocabulary-sized state)
    * can't give. Each micro-batch emits the updated shards' current
    * (token, minCount) candidates; the exact-recount second pass is
    * the batch-side `HeavyHitters.frequentTokens` once candidates
    * settle. */
  def streamingHeavyHitters(docs: DataFrame, textCol: String,
                            capacity: Int = 1000,
                            shards: Int = 64): org.apache.spark.sql.Dataset[TokenWeight] = {
    import docs.sparkSession.implicits._
    val mg = new graft.operators.HeavyHitters.MisraGries(capacity)
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .withColumn("shard", pmod(hash(col("token")), lit(shards)).cast("int"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[graft.operators.HeavyHitters.Sketch, TokenWeight](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state: GroupState[graft.operators.HeavyHitters.Sketch]) =>
          val next = rows.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
            (buf, row) => mg.reduce(buf, row._1)
          }
          state.update(next)
          next.iterator.map { case (t, c) => TokenWeight(shard, t, c) }
      }
  }

  /** Stream-stream interval join: pair each conversion with the same
    * user's touch events from the preceding lookback window, as the
    * events ARRIVE — the streaming twin of the q153 attribution
    * pairing (graft.operators.Attribution), built on Structured
    * Streaming's watermarked stream-stream join so state is bounded:
    * each side keeps only `watermark + lookback` of history, exactly
    * the built-in mechanism a hand-rolled buffer would reinvent.
    *
    * Both inputs must be STREAMING frames carrying (userCol, tsCol,
    * plus payload). The join condition is the same as the batch
    * operator: equal user, `touch.ts ∈ (conv.ts − lookback, conv.ts]`
    * — so on time-ordered replays the emitted pair set equals the
    * batch inner join (asserted in IncrementalStreamSpec); late data
    * beyond the watermark is dropped by contract, which is the
    * streaming semantics the batch gold rebuild reconciles.
    *
    * Column contract: touch columns come out prefixed `t_`, conversion
    * columns `c_`. */
  def touchPairsStream(touches: DataFrame, conversions: DataFrame,
                       userCol: String, tsCol: String,
                       lookbackSec: Long, watermarkSec: Long = 3600L): DataFrame = {
    require(lookbackSec > 0 && watermarkSec >= 0,
      s"need lookbackSec > 0, watermarkSec >= 0: ($lookbackSec, $watermarkSec)")
    def side(df: DataFrame, p: String) = df.select(df.columns.map(c =>
        col(c).as(s"$p$c")): _*)
      .withWatermark(s"$p$tsCol", s"$watermarkSec seconds")
    side(touches, "t_").join(side(conversions, "c_"),
      expr(s"""t_$userCol = c_$userCol
              | AND t_$tsCol <= c_$tsCol
              | AND t_$tsCol > c_$tsCol - INTERVAL $lookbackSec SECONDS""".stripMargin))
  }

  // ---------------------------------------------------- custom state
  case class FunnelEvent(userId: Long, ts: java.sql.Timestamp,
                         eventId: Long, eventType: String)
  case class FunnelUpdate(userId: Long, stepsReached: Int, chainUs: Seq[Long])

  /** Incremental funnel state (`mapGroupsWithState`): each user's
    * greedy earliest-completion chain (graft.operators.Funnel
    * semantics — step i is the earliest matching event strictly after
    * step i−1) maintained across micro-batches. The greedy fold is
    * prefix-stable: already-reached steps never change, so folding a
    * time-ordered stream batch-by-batch lands on EXACTLY the batch
    * operator's chain (asserted in IncrementalStreamSpec). Same
    * arrival-order contract as [[sessionize]]: within a batch events
    * fold in (ts, eventId) order; late cross-batch events are the
    * watermark's problem, not the fold's.
    *
    * State per user is `steps.size` longs — bounded, no event buffer.
    * Emits an update row (userId, steps reached, chain µs) per user
    * per touched batch. */
  def funnelStream(events: org.apache.spark.sql.Dataset[FunnelEvent],
                   steps: Seq[String]): org.apache.spark.sql.Dataset[FunnelUpdate] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      s"need >= 2 distinct funnel steps: $steps")
    import events.sparkSession.implicits._
    val k = steps.size
    events.groupByKey(_.userId)
      .mapGroupsWithState[Seq[Long], FunnelUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[Seq[Long]]) =>
          // full-precision epoch µs (getTime alone truncates to ms)
          def us0(t: java.sql.Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          val init = state.getOption.getOrElse(Seq.fill(k)(-1L))
          val sorted = evs.toSeq.sortBy(e => (us0(e.ts), e.eventId))
          val next = sorted.foldLeft(init) { (chain, e) =>
            val us = us0(e.ts)
            chain.zipWithIndex.map { case (t, i) =>
              if (t >= 0) t
              else if (e.eventType == steps(i) &&
                (i == 0 || (chain(i - 1) >= 0 && us > chain(i - 1)))) us
              else -1L
            }
          }
          state.update(next)
          FunnelUpdate(userId, next.count(_ >= 0), next)
      }
  }

  case class SessionEvent(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionCount: Long, lastTs: Long, events: Long, total: Double)
  case class SessionUpdate(userId: Long, sessionCount: Long, events: Long, total: Double)

  /** Gap-based sessionization with explicit state
    * (`mapGroupsWithState`) — the custom-state path for semantics the
    * built-in windows can't express (the batch twin is
    * EtlQueries.q18Sessions). State is per-key and timeout-collected. */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
                 gapMs: Long): org.apache.spark.sql.Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val init = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
          val next = sorted.foldLeft(init) { (st, e) =>
            val isNew = st.lastTs == Long.MinValue || e.ts.getTime - st.lastTs > gapMs
            SessionState(st.sessionCount + (if (isNew) 1 else 0),
              e.ts.getTime, st.events + 1, st.total + e.value)
          }
          state.update(next)
          SessionUpdate(userId, next.sessionCount, next.events, next.total)
      }
  }
}
