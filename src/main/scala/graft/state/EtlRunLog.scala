package graft.state

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O4/O5 — run-status + watermark state table (`etl_run_log`,
  * daily_scheduler.py:24-83; columns per FIXTURES.md §6).
  *
  * A small driver-side state table: append-per-event parquet, latest
  * status resolved by max(id) per run. At scale this stays tiny (rows =
  * runs × entities), so a coalesce(1) append is fine.
  */
object EtlRunLog {
  val ISO: DateTimeFormatter = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  case class Run(id: Long, storeName: String, entityName: String,
                 status: String, ingestedAt: String,
                 stagingSuccess: Boolean, sourceUpdatedAt: Option[String],
                 mergeSuccess: Boolean, notes: Option[String])

  final class Store(spark: SparkSession, path: String) {
    import spark.implicits._

    /** Parquet appends are not concurrency-safe (shared `_temporary`
      * staging dir); the reference leaned on Postgres for this. All
      * writes are serialized through this lock — contention is nil for
      * a control-plane table. */
    private val writeLock = new Object

    def all(): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(path)
      else spark.emptyDataset[Run].toDF()
    }

    private def append(run: Run): Unit =
      Seq(run).toDF().coalesce(1).write.mode("append").parquet(path)

    private def nextId(): Long =
      all().agg(coalesce(max($"id"), lit(0L))).head().getLong(0) + 1

    /** Insert a RUNNING row, returning its id (daily_scheduler.py:24-36). */
    def logStart(store: String, entity: String, now: LocalDateTime): Long =
      writeLock.synchronized {
        val id = nextId()
        append(Run(id, store, entity, "RUNNING", now.format(ISO),
          stagingSuccess = false, None, mergeSuccess = false, None))
        id
      }

    /** Mark staging success + watermark (daily_scheduler.py:38-49). */
    def logStagingSuccess(id: Long, watermark: Option[String], now: LocalDateTime): Unit =
      appendStatus(id, "SUCCESS", stagingSuccess = true, watermark, mergeSuccess = false, None, now)

    def logFailure(id: Long, notes: String, now: LocalDateTime): Unit =
      appendStatus(id, "FAILED", stagingSuccess = false, None, mergeSuccess = false, Some(notes), now)

    def logMergeSuccess(id: Long, now: LocalDateTime): Unit =
      appendStatus(id, "SUCCESS", stagingSuccess = true, None, mergeSuccess = true, None, now)

    private def appendStatus(id: Long, status: String, stagingSuccess: Boolean,
                             watermark: Option[String], mergeSuccess: Boolean,
                             notes: Option[String], now: LocalDateTime): Unit = writeLock.synchronized {
      val prior = all().filter($"id" === id).orderBy($"ingestedAt".desc)
        .as[Run].collect().headOption
      val (store, entity) = prior.map(r => (r.storeName, r.entityName)).getOrElse(("", ""))
      val wm = watermark.orElse(prior.flatMap(_.sourceUpdatedAt))
      append(Run(id, store, entity, status, now.format(ISO),
        stagingSuccess, wm, mergeSuccess, notes))
    }

    /** O5 — watermark resolution with overlap lookback
      * (daily_scheduler.py:64-83): restart from
      * `today − (2 + days_since_success)` — i.e. two days BEFORE the
      * last success (the reference's get_start_date computes
      * now − (2 + days_gap)); 3-day default lookback when no history.
      * `daysSince` is clamped at 0 against clock skew. Rerun-safety
      * comes from upsert idempotence, not from exactness here. */
    def resolveStartDate(store: String, entity: String, today: LocalDate): LocalDate = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"storeName", $"entityName").orderBy($"id".desc, $"ingestedAt".desc)
      val last = all()
        .filter($"storeName" === store && $"entityName" === entity &&
          $"status" === "SUCCESS" && $"sourceUpdatedAt".isNotNull)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"sourceUpdatedAt").as[String].collect().headOption
      last match {
        case Some(ts) =>
          val lastDate = LocalDate.parse(ts.take(10))
          val daysSince = math.max(
            java.time.temporal.ChronoUnit.DAYS.between(lastDate, today), 0L)
          today.minusDays(2 + daysSince)
        case None => today.minusDays(3)
      }
    }
  }
}
