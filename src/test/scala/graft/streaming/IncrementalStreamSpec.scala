package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{Fixtures, SparkSpec}
import graft.model.Schemas
import graft.silver.Flatten

class IncrementalStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming upsert: AvailableNow drains files into gold, idempotent merge") {
    val root = Files.createTempDirectory("graft-stream").toString
    val in = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    // batch 1: two orders as JSONL nodes
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.jsonl"),
      Fixtures.orderNodes + "\n" + Fixtures.orderNodeSparse + "\n")

    val stream = IncrementalStream.streamJsonl(spark, Schemas.orderNode, in)
    val q1 = IncrementalStream.upsertSink(stream,
      b => Flatten.orders(b, "R-"), s"$root/gold", Seq("order_id"),
      s"$root/ckpt", latestBy = "updated_at")
    q1.awaitTermination(60000)

    val gold1 = spark.read.parquet(s"$root/gold")
    assert(gold1.count() == 2)
    assert(gold1.filter($"order_id" === "R-5551234")
      .select("total_price").as[Double].head() == 112.5)

    // batch 2: updated version of order 5551234 (newer updatedAt, new price)
    val updated = Fixtures.orderNodes
      .replace(""""updatedAt": "2025-12-07T11:00:00Z"""",
        """"updatedAt": "2025-12-08T09:00:00Z"""")
      .replace(""""amount": "112.50"""", """"amount": "200.00"""")
    Files.writeString(java.nio.file.Paths.get(s"$in/b2.jsonl"), updated + "\n")

    val q2 = IncrementalStream.upsertSink(
      IncrementalStream.streamJsonl(spark, Schemas.orderNode, in),
      b => Flatten.orders(b, "R-"), s"$root/gold", Seq("order_id"),
      s"$root/ckpt", latestBy = "updated_at")
    q2.awaitTermination(60000)

    val gold2 = spark.read.parquet(s"$root/gold")
    assert(gold2.count() == 2) // upsert, not append
    assert(gold2.filter($"order_id" === "R-5551234")
      .select("total_price").as[Double].head() == 200.0)
  }

  test("watermarked windowed aggregation plans as streaming agg") {
    val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.sql.Timestamp, String, Double)](spark)
    val df = events.toDF().toDF("ts", "event_type", "value")
    val agg = IncrementalStream.windowedCounts(df, "ts", "event_type",
      "1 hour", "2 hours")
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    events.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:15:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    val out = spark.table("win_counts")
      .select($"event_type", $"n", $"total_value").collect()
    q.stop()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streaming exact dedup drops in-horizon duplicates, keeps distinct docs") {
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.sql.Timestamp, Long, String)](spark)
    val df = docs.toDF().toDF("ts", "doc_id", "text")
    val deduped = IncrementalStream.dedupStream(df, "ts", "text", "1 hour")
    assert(deduped.isStreaming)
    val q = deduped.writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    docs.addData(
      (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
      (ts("2024-01-01 10:05:00"), 2L, "the quick brown fox"), // dup content
      (ts("2024-01-01 10:10:00"), 3L, "a different document"))
    q.processAllAvailable()
    val out = spark.table("dedup_docs")
    assert(out.count() == 2) // one copy per distinct fingerprint
    assert(out.select("text").as[String].collect().toSet ==
      Set("the quick brown fox", "a different document"))
    q.stop()
  }

  test("streaming curation: gate -> scrub -> bounded dedup -> stable splits") {
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.sql.Timestamp, Long, String)](spark)
    val df = docs.toDF().toDF("ts", "doc_id", "text")
    val curated = IncrementalStream.curationStream(df, "doc_id", "ts", "text", "1 hour")
    assert(curated.isStreaming)
    val q = curated.writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val good = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs.addData(
      (ts("2024-01-01 10:00:00"), 1L, good + " mail me a.b@x.io today"),
      (ts("2024-01-01 10:05:00"), 2L, good + " mail me a.b@x.io today"), // dup post-scrub
      (ts("2024-01-01 10:10:00"), 3L, "zz"), // fails the quality gate
      (ts("2024-01-01 10:15:00"), 4L, good + " something different entirely"))
    q.processAllAvailable()
    val out = spark.table("curated_docs").select("doc_id", "text", "split")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    q.stop()
    assert(out.size == 2 && !out.contains(3L)) // gate + dedup applied
    val survivor = out.keySet.intersect(Set(1L, 2L)).head
    assert(out(survivor)._1.contains("<EMAIL>")) // scrubbed before emission
    assert(out.contains(4L))
    // split label matches the batch operator for the same (seed, id) —
    // replay/engine-independent by construction
    import org.apache.spark.sql.functions.col
    val batch = graft.operators.Sampling.assignSplit(
      Seq((survivor, "x"), (4L, "y")).toDF("doc_id", "text"),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.1), seed = 11)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(survivor)._2 == batch(survivor) && out(4L)._2 == batch(4L))
  }

  test("streaming heavy hitters: bounded sketches track the hot token across batches") {
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
    val hh = IncrementalStream.streamingHeavyHitters(
      docs.toDF().toDF("text"), "text", capacity = 4, shards = 2)
    val q = hh.writeStream.format("memory").queryName("hot_tokens")
      .outputMode("update").start()
    // batch 1: "hot" dominates a small vocabulary
    docs.addData((1 to 30).map(i => s"hot filler$i hot"): _*)
    q.processAllAvailable()
    val b1 = spark.table("hot_tokens")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(b1.contains("hot") && b1("hot") >= 30) // 60 occurrences, MG underestimate allowed
    // batch 2: state persists — the count keeps accumulating
    docs.addData((1 to 20).map(i => s"hot other$i"): _*)
    q.processAllAvailable()
    val b2 = spark.table("hot_tokens")
      .collect().filter(_.getString(1) == "hot").map(_.getLong(2)).max
    q.stop()
    assert(b2 > b1("hot")) // accumulated across micro-batches
    // bounded state: never more than shards x capacity live entries
    assert(spark.table("hot_tokens").select("shard", "token").distinct().count() <= 2 * 4 * 2)
  }

  test("mapGroupsWithState sessionization counts gap-separated sessions") {
    import IncrementalStream._
    val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent](spark)
    val updates = sessionize(events.toDS(), gapMs = 30 * 60 * 1000)
    val q = updates.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    events.addData(
      SessionEvent(1, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1, ts("2024-01-01 10:10:00"), 2.0), // same session
      SessionEvent(1, ts("2024-01-01 12:00:00"), 3.0), // gap → new session
      SessionEvent(2, ts("2024-01-01 09:00:00"), 4.0))
    q.processAllAvailable()
    val out = spark.table("sessions").as[SessionUpdate].collect()
      .map(u => u.userId -> u).toMap
    q.stop()
    assert(out(1L).sessionCount == 2 && out(1L).events == 3)
    assert(out(2L).sessionCount == 1)
  }

  test("streaming incremental dedup verdicts match the batch operator") {
    import graft.operators.IncrementalDedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "pack my box with five dozen liquor jugs before the night ends"))
      .toDF("doc_id", "text")
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text")

    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String)](spark)
    val batchRows = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (11L, "quick brown fox jumps over the lazy dog near the river bank"),
      (12L, "an entirely unrelated document about cooking pasta at home tonight"))
    docs.addData(batchRows: _*)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Option[Long])]
    val q = IncrementalStream.incrementalDedupSink(
      docs.toDF().toDF("doc_id", "text"), index, "doc_id", "text",
      Files.createTempDirectory("ckpt-inc").toString) { verdicts =>
      got ++= verdicts.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    }
    q.awaitTermination(60000)

    val expected = IncrementalDedup
      .dedupAgainst(batchRows.toDF("doc_id", "text"), index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got.toSet == expected)
    assert(got.exists(t => t._1 == 10L && t._2 == "exact_dup" && t._3.contains(1L)))
    assert(got.exists(t => t._1 == 11L && t._2 == "near_dup"))
    assert(got.exists(t => t._1 == 12L && t._2 == "new"))
  }

  test("streaming count-min: bounded counter state equals the batch sketch") {
    import graft.operators.Sketches
    val keys = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
    val counters = IncrementalStream.cmsStream(
      keys.toDF().toDF("k"), "k", depth = 4, width = 64)
    assert(counters.isStreaming)
    val q = counters.writeStream.format("memory").queryName("cms_counters")
      .outputMode("complete").start()
    val data = (1 to 200).map(i => s"k${i % 37}")
    keys.addData(data: _*)
    q.processAllAvailable()
    val got = spark.table("cms_counters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val exp = Sketches.countMin(data.toDF("k"), "k", 4, 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp)
  }

  test("hygiene cleaning (NFC + HTML strip) runs inside a streaming query") {
    import graft.operators.CleanOps
    import org.apache.spark.sql.functions._
    // cleanText/stripHtml are stateless projections (compiled
    // expressions + regexp_replace), so they must compose with any
    // streaming source with no extra output mode constraints
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String)](spark)
    val cleaned = docs.toDF().toDF("doc_id", "page")
      .select(col("doc_id"),
        CleanOps.cleanText(CleanOps.stripHtml(col("page"))).as("text"))
    assert(cleaned.isStreaming)
    val q = cleaned.writeStream.format("memory").queryName("clean_docs")
      .outputMode("append").start()
    docs.addData(
      (1L, "<p>cafe\u0301   one</p>"),
      (2L, "plain &amp; simple\r\n"))
    q.processAllAvailable()
    val out = spark.table("clean_docs").orderBy("doc_id")
      .select("text").as[String].collect().toSeq
    assert(out == Seq("caf\u00e9 one", "plain & simple"))
    q.stop()
  }

  test("maintained rollup folds micro-batches; replayed batch ids skip") {
    val root = Files.createTempDirectory("graft-mv").toString
    val state = s"$root/rollup"
    val aggs = Seq(
      ("total", sum($"v"), sum($"total")),
      ("n", count(lit(1)), sum($"n")))
    def read() = spark.read.parquet(state)
      .select("day", "total", "n").as[(String, Long, Long)].collect().toSet

    IncrementalStream.applyRollupBatch(
      Seq(("d1", 10L), ("d1", 5L), ("d2", 1L)).toDF("day", "v"),
      batchId = 0, state, Seq("day"), aggs)
    assert(read() == Set(("d1", 15L, 2L), ("d2", 1L, 1L)))

    IncrementalStream.applyRollupBatch(
      Seq(("d2", 4L), ("d3", 7L)).toDF("day", "v"),
      batchId = 1, state, Seq("day"), aggs)
    assert(read() == Set(("d1", 15L, 2L), ("d2", 5L, 2L), ("d3", 7L, 1L)))

    // crash-replay of batch 1: must NOT double-count
    IncrementalStream.applyRollupBatch(
      Seq(("d2", 4L), ("d3", 7L)).toDF("day", "v"),
      batchId = 1, state, Seq("day"), aggs)
    assert(read() == Set(("d1", 15L, 2L), ("d2", 5L, 2L), ("d3", 7L, 1L)))
  }

  test("maintained HLL registers: folded state answers == batch slidingDistinct") {
    val root = Files.createTempDirectory("graft-hll").toString
    val state = s"$root/registers"
    val b1 = (1 to 100).map(u => (10L, u.toLong))
    val b2 = (50 to 150).map(u => (11L, u.toLong)) ++
      (1 to 30).map(u => (20L, u.toLong))

    IncrementalStream.applyHllRegisterBatch(
      b1.toDF("day", "u"), 0, state, "day", "u", b = 10)
    IncrementalStream.applyHllRegisterBatch(
      b2.toDF("day", "u"), 1, state, "day", "u", b = 10)
    // crash-replay of batch 1: guard skips, state unchanged
    val before = spark.read.parquet(state).collect().toSet
    IncrementalStream.applyHllRegisterBatch(
      b2.toDF("day", "u"), 1, state, "day", "u", b = 10)
    assert(spark.read.parquet(state).collect().toSet == before)

    val streamed = IncrementalStream
      .slidingDistinctFromState(spark, state, b = 10, windowDays = 7)
      .as[(Long, Long)].collect().toList
    val batch = graft.operators.Sketches.slidingDistinct(
      (b1 ++ b2).toDF("day", "u"), "day", "u", b = 10, windowDays = 7)
      .as[(Long, Long)].collect().toList
    assert(streamed == batch)
  }

  test("maintained rollup survives an empty first micro-batch") {
    val root = Files.createTempDirectory("graft-mv0").toString
    val state = s"$root/rollup"
    val aggs = Seq(
      ("total", sum($"v"), sum($"total")),
      ("n", count(lit(1)), sum($"n")))
    // batch 0 is empty: writes a zero-row state table whose
    // max(__batch_id) is NULL — the sink must treat that as "nothing
    // applied yet", not NPE-wedge on the guard read
    IncrementalStream.applyRollupBatch(
      Seq.empty[(String, Long)].toDF("day", "v"), 0, state, Seq("day"), aggs)
    IncrementalStream.applyRollupBatch(
      Seq(("d1", 4L)).toDF("day", "v"), 1, state, Seq("day"), aggs)
    val out = spark.read.parquet(state)
      .select("day", "total", "n").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("d1", 4L, 1L)))
    // replay of batch 1 still skips
    IncrementalStream.applyRollupBatch(
      Seq(("d1", 4L)).toDF("day", "v"), 1, state, Seq("day"), aggs)
    val out2 = spark.read.parquet(state)
      .select("day", "total", "n").as[(String, Long, Long)].collect().toSet
    assert(out2 == Set(("d1", 4L, 1L)))
  }

  test("streaming dataset manifest: per-(lang,split) card stays fresh per batch") {
    // the q108 manifest as a maintained rollup: docs arrive in
    // micro-batches, the per-(lang, split) card folds incrementally —
    // counts/token sums move O(state + batch) per trigger, and the
    // final card equals the batch manifest over everything seen
    import graft.operators.Sampling
    import graft.functions.TextFunctions.tokenCount
    val root = Files.createTempDirectory("graft-manifest").toString
    val aggs = Seq(
      ("n_docs", count(lit(1)), sum($"n_docs")),
      ("n_tokens", sum(tokenCount($"text").cast("long")), sum($"n_tokens")))
    val splits = Seq("train" -> 0.9, "holdout" -> 0.1)
    def label(df: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplit(df, "doc_id", splits, seed = 5)
    val day1 = Seq((1L, "en", "alpha beta gamma"), (2L, "de", "eins zwei"),
      (3L, "en", "one two three four")).toDF("doc_id", "lang", "text")
    val day2 = Seq((4L, "en", "five six"), (5L, "de", "drei")).toDF("doc_id", "lang", "text")
    IncrementalStream.applyRollupBatch(label(day1), 0, s"$root/card",
      Seq("lang", "split"), aggs)
    IncrementalStream.applyRollupBatch(label(day2), 1, s"$root/card",
      Seq("lang", "split"), aggs)
    val card = spark.read.parquet(s"$root/card")
      .select("lang", "split", "n_docs", "n_tokens")
      .as[(String, String, Long, Long)].collect().toSet
    val full = label(day1.unionByName(day2))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount($"text").cast("long")).as("n_tokens"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(card == full, s"card=$card full=$full")
  }

  test("maintained Krippendorff: streamed count state ≡ batch α; replay skips") {
    val root = Files.createTempDirectory("graft-kripp").toString
    val state = s"$root/counts"
    // missing-data shape on purpose: unit u3 gets ONE rating (not
    // pairable), u4 appears only in batch 2, u1 accretes across batches
    val b1 = Seq(("u1", "yes"), ("u1", "yes"), ("u2", "no"),
      ("u2", "yes"), ("u3", "no"))
    val b2 = Seq(("u1", "no"), ("u2", "no"), ("u4", "yes"), ("u4", "yes"))

    IncrementalStream.applyKrippendorffBatch(
      b1.toDF("unit", "label"), 0, state, "unit", "label")
    IncrementalStream.applyKrippendorffBatch(
      b2.toDF("unit", "label"), 1, state, "unit", "label")
    // crash-replay of batch 1: the guard must not double-count ratings
    val before = spark.read.parquet(state).collect().toSet
    IncrementalStream.applyKrippendorffBatch(
      b2.toDF("unit", "label"), 1, state, "unit", "label")
    assert(spark.read.parquet(state).collect().toSet == before)

    val streamed = IncrementalStream.krippendorffFromState(spark, state)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toList
    val batch = graft.operators.LabelOps.krippendorffAlpha(
      (b1 ++ b2).toDF("unit", "label"), "unit", "label")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toList
    assert(streamed == batch, "maintained state diverged from batch α")
  }

  test("maintained Krippendorff end-to-end through the streaming sink") {
    val root = Files.createTempDirectory("graft-kripp2").toString
    val rows = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (String, String)](spark)
    rows.addData(("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "a"))
    val q = IncrementalStream.krippendorffSink(
      rows.toDF().toDF("unit", "label"), s"$root/counts",
      "unit", "label", s"$root/ckpt")
    q.awaitTermination(60000)
    val streamed = IncrementalStream
      .krippendorffFromState(spark, s"$root/counts").collect().toSeq
    val batch = graft.operators.LabelOps.krippendorffAlpha(
      Seq(("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "a"))
        .toDF("unit", "label"), "unit", "label").collect().toSeq
    assert(streamed == batch)
  }

  test("maintained rollup end-to-end through the streaming sink") {
    val root = Files.createTempDirectory("graft-mv2").toString
    val rows = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (String, Long)](spark)
    rows.addData(("d1", 2L), ("d1", 3L), ("d2", 10L)) // before start: AvailableNow
    val q = IncrementalStream.maintainedRollupSink(
      rows.toDF().toDF("day", "v"), s"$root/rollup", Seq("day"),
      Seq(("total", sum($"v"), sum($"total")), ("n", count(lit(1)), sum($"n"))),
      s"$root/ckpt")
    q.awaitTermination(60000)
    val out = spark.read.parquet(s"$root/rollup")
      .select("day", "total", "n").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("d1", 5L, 2L), ("d2", 10L, 1L)))
  }

  test("versioned rollup: each batch commits a time-travelable snapshot") {
    import graft.sources.VersionedTable
    val root = Files.createTempDirectory("graft-mv3").toString
    val state = s"$root/rollup"
    val aggs = Seq(
      ("total", sum($"v"), sum($"total")),
      ("n", count(lit(1)), sum($"n")))
    IncrementalStream.applyVersionedRollupBatch(
      Seq(("d1", 10L)).toDF("day", "v"), 0, state, Seq("day"), aggs)
    IncrementalStream.applyVersionedRollupBatch(
      Seq(("d1", 5L), ("d2", 2L)).toDF("day", "v"), 1, state, Seq("day"), aggs)
    // replay of batch 1 must not advance the version chain
    IncrementalStream.applyVersionedRollupBatch(
      Seq(("d1", 5L), ("d2", 2L)).toDF("day", "v"), 1, state, Seq("day"), aggs)
    val vs = VersionedTable.versions(spark, state)
    assert(vs.size == 2, s"expected 2 snapshots, got $vs")
    // current = both batches folded
    val cur = VersionedTable.read(spark, state).get
      .select("day", "total", "n").as[(String, Long, Long)].collect().toSet
    assert(cur == Set(("d1", 15L, 2L), ("d2", 2L, 1L)))
    // time travel: the rollup as of batch 0
    val v0 = VersionedTable.readVersion(spark, state, vs.head).get
      .select("day", "total", "n").as[(String, Long, Long)].collect().toSet
    assert(v0 == Set(("d1", 10L, 1L)))
  }

  test("streaming SCD2: history accretes versions across micro-batches") {
    val root = Files.createTempDirectory("graft-scd2").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // AvailableNow drains what exists at start, then stops (the daily
    // batch semantics) — so each "day" is its own short-lived query,
    // like the upsertSink test above
    def drain(rows: (Long, java.sql.Timestamp, Long, String)*): Unit = {
      val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
        (Long, java.sql.Timestamp, Long, String)](spark)
      events.addData(rows: _*)
      val q = IncrementalStream.scd2Sink(
        events.toDF().toDF("k", "ts", "eid", "attr"), s"$root/hist",
        Seq("k"), "ts", "eid", Seq("attr"),
        Files.createTempDirectory("graft-scd2-ckpt").toString)
      q.awaitTermination(60000)
    }
    drain((1L, ts("2024-01-01 00:00:00"), 1L, "A"))
    drain(
      (1L, ts("2024-01-02 00:00:00"), 2L, "B"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "B"), // re-statement: no version
      (2L, ts("2024-01-01 00:00:00"), 4L, "X"))
    val hist = spark.read.parquet(s"$root/hist")
    val k1 = hist.filter($"k" === 1).orderBy("version")
      .select("attr", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k1 == Seq(("A", false), ("B", true)))
    assert(hist.filter($"k" === 2).count() == 1)
  }

  test("streaming BM25 index: maintained batches ≡ batch build; replay is a no-op") {
    import graft.operators.{Bm25, Bm25Index}
    val root = Files.createTempDirectory("graft-bm25s").toString
    val idx = s"$root/idx"
    val b1 = Seq((1L, "spark hash join"), (2L, "table scan spark")).toDF("id", "text")
    val b2 = Seq((3L, "window sort hash"), (4L, "join join batch")).toDF("id", "text")

    IncrementalStream.applyBm25IndexBatch(b1, 0L, idx, "id", "text", nBuckets = 8)
    IncrementalStream.applyBm25IndexBatch(b2, 1L, idx, "id", "text", nBuckets = 8)

    val qs = Seq(1 -> "hash join", 2 -> "spark table")
    val streamed = Bm25Index.search(spark, idx, qs, k = 4)
      .collect().map(_.toString).sorted.toSeq

    // the batch-built index over the SAME corpus must agree exactly
    val batchIdx = s"$root/batch"
    Bm25Index.build(b1.unionByName(b2), "id", "text", batchIdx, nBuckets = 8)
    val batch = Bm25Index.search(spark, batchIdx, qs, k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")

    // crash-replay of batch 1: postings overwrite in place, stats skip
    IncrementalStream.applyBm25IndexBatch(b2, 1L, idx, "id", "text", nBuckets = 8)
    val replayed = Bm25Index.search(spark, idx, qs, k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(replayed == streamed, "replayed batch must not change the index")
    val stats = spark.read.parquet(s"$idx/stats").collect().head
    assert(stats.getAs[Long]("n") == 4L)

    // the sink wrapper drains a MemoryStream through the same fold
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String)](spark)
    docs.addData((10L, "spark hash"), (11L, "sort table"))
    val idx2 = s"$root/idx2"
    val q = IncrementalStream.bm25IndexSink(docs.toDF().toDF("id", "text"),
      "id", "text", idx2, nBuckets = 8, s"$root/cp")
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$idx2/stats").collect().head.getAs[Long]("n") == 2L)

    // the stats sidecar pins the bucket modulus: folding a batch with
    // a different nBuckets must refuse, not scatter the layout
    val ex = intercept[IllegalArgumentException] {
      IncrementalStream.applyBm25IndexBatch(
        Seq((99L, "late doc")).toDF("id", "text"), 2L, idx, "id", "text",
        nBuckets = 16)
    }
    assert(ex.getMessage.contains("n_buckets=8"), ex.getMessage)
  }

  test("streaming CDC chunk store: maintained batches + compact ≡ batch build; params pinned") {
    import graft.operators.{Cdc, CdcIndex}
    val root = Files.createTempDirectory("graft-cdcs").toString
    val idx = s"$root/idx"
    val tail = " common suffix bytes that deduplicate across the corpus " * 3
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta" + tail),
      (2L, "one two three four five six seven" + tail)).toDF("id", "text")
    val b2 = Seq((3L, "lorem ipsum dolor sit amet consectetur" + tail),
      (4L, "pack my box with five dozen liquor jugs" + tail)).toDF("id", "text")

    IncrementalStream.applyCdcIndexBatch(b1, 0L, idx, "id", "text", nBuckets = 8)
    IncrementalStream.applyCdcIndexBatch(b2, 1L, idx, "id", "text", nBuckets = 8)
    val streamed = CdcIndex.sharing(spark, idx)
      .collect().map(_.toString).sorted.toSeq

    // direct batch path over the SAME corpus must agree exactly
    val direct = Cdc.chunkDedup(
      b1.unionByName(b2).withColumnRenamed("id", "doc_id"), "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == direct, s"streamed=$streamed direct=$direct")

    // crash-replay of batch 1 is a no-op (stats guard)
    IncrementalStream.applyCdcIndexBatch(b2, 1L, idx, "id", "text", nBuckets = 8)
    assert(CdcIndex.sharing(spark, idx)
      .collect().map(_.toString).sorted.toSeq == streamed)
    assert(spark.read.parquet(s"$idx/stats").head().getAs[Long]("n") == 4L)

    // compaction folds the two __batch layers; sharing byte-identical
    assert(CdcIndex.compact(spark, idx).contains(2L))
    assert(CdcIndex.sharing(spark, idx)
      .collect().map(_.toString).sorted.toSeq == streamed)

    // chunking parameters are pinned: a divisor change refuses loudly
    val ex = intercept[IllegalArgumentException] {
      IncrementalStream.applyCdcIndexBatch(
        Seq((9L, "late doc")).toDF("id", "text"), 2L, idx, "id", "text",
        nBuckets = 8, divisor = 32)
    }
    assert(ex.getMessage.contains("pinned"), ex.getMessage)

    // the sink wrapper drains a MemoryStream through the same fold
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String)](spark)
    docs.addData((10L, "first streamed doc" + tail), (11L, "second" + tail))
    val idx2 = s"$root/idx2"
    val q = IncrementalStream.cdcIndexSink(docs.toDF().toDF("id", "text"),
      "id", "text", idx2, nBuckets = 8, s"$root/cp")
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$idx2/stats").head().getAs[Long]("n") == 2L)
  }

  test("streaming drift log: per-batch PSI equals the batch twin; replay no-op") {
    val root = Files.createTempDirectory("graft-drift").toString
    val b = 64
    val reference = Seq("alpha beta gamma delta", "alpha beta epsilon",
      "gamma delta alpha").toDF("text")
    val day1 = Seq((1L, "alpha beta gamma"), (2L, "alpha delta"))
    val day2 = Seq((3L, "zork quux flarp"), (4L, "zork zork"))

    // one source + one checkpoint across drains: the second query
    // RESUMES from the checkpoint and gets the next micro-batch id —
    // restart semantics, not a fresh stream
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String)](spark)
    def drain(rows: Seq[(Long, String)]): Unit = {
      docs.addData(rows: _*)
      val q = IncrementalStream.driftSink(docs.toDF().toDF("doc_id", "text"),
        reference, s"$root/log", "text", b, s"$root/ckpt")
      q.awaitTermination(60000)
    }
    drain(day1)
    drain(day2)

    val log = spark.read.parquet(s"$root/log")
    def logged(id: Long) = log.filter($"__batch_id" === id)
      .select("bucket", "c_base", "c_cur", "psi_q")
      .as[(Long, Long, Long, Long)].collect().toSet
    def twin(rows: Seq[(Long, String)]) = graft.operators.Drift
      .psiByBucket(reference, rows.toDF("doc_id", "text"), "text", b)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(logged(0L) == twin(day1))
    assert(logged(1L) == twin(day2))

    // day2 drifted (disjoint vocabulary) — its PSI must dominate day1's
    val traj = IncrementalStream.driftTrajectory(spark, s"$root/log")
      .as[(Long, Long)].collect().toSeq
    assert(traj.map(_._1) == Seq(0L, 1L))
    assert(traj(1)._2 > traj(0)._2,
      s"disjoint-vocabulary batch should score higher PSI: $traj")

    // crash-replay of an applied batch id is a no-op
    val before = log.collect().toSet
    IncrementalStream.applyDriftBatch(day2.toDF("doc_id", "text"), 1L,
      reference, s"$root/log", "text", b)
    val after = spark.read.parquet(s"$root/log").collect().toSet
    assert(after == before)
  }

  test("stream-stream touch pairing equals the batch interval join") {
    import IncrementalStream._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val touches = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, String)](spark)
    val convs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Double)](spark)
    val joined = touchPairsStream(
      touches.toDF().toDF("user", "ts", "kind"),
      convs.toDF().toDF("user", "ts", "cents"),
      "user", "ts", lookbackSec = 600)
    val q = joined.writeStream.format("memory").queryName("touch_pairs")
      .outputMode("append").start()
    // touches at 10:00/10:07/10:20 for user 1; conversion at 10:09
    // pairs with the first two (10-min lookback), not the later one;
    // user 2's touch never pairs (different user)
    touches.addData((1L, ts(0), "view"), (1L, ts(7), "click"), (2L, ts(3), "view"))
    convs.addData((1L, ts(9), 100.0))
    q.processAllAvailable()
    touches.addData((1L, ts(20), "view"))
    convs.addData((1L, ts(25), 200.0))
    q.processAllAvailable()
    val got = spark.table("touch_pairs")
      .select("t_kind", "t_ts", "c_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    q.stop()
    assert(got == Set(
      ("view", ts(0), ts(9)), ("click", ts(7), ts(9)),
      ("view", ts(20), ts(25))),
      s"streamed pairs diverged: $got")
    // batch twin over the full data agrees
    val bt = Seq((1L, ts(0), "view"), (1L, ts(7), "click"), (2L, ts(3), "view"),
      (1L, ts(20), "view")).toDF("user", "ts", "kind")
    val bc = Seq((1L, ts(9), 100.0), (1L, ts(25), 200.0)).toDF("user", "ts", "cents")
    val batch = bt.as("t").join(bc.as("c"),
      expr("t.user = c.user AND t.ts <= c.ts AND t.ts > c.ts - INTERVAL 600 SECONDS"))
      .select(col("t.kind"), col("t.ts"), col("c.ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(batch == got)
  }

  test("streaming funnel state equals the batch greedy chain, batch by batch") {
    import IncrementalStream._
    val steps = Seq("view", "click", "buy")
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    // user 1 completes across THREE micro-batches; user 2's click
    // arrives before any view (must not chain); user 3 same-µs
    // view+click (strictly-after keeps click unchained)
    val all = Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "error"),
      (3L, 500L, 2L, "click"),
      (4L, 3000L, 3L, "view"), (5L, 3000L, 3L, "click"),
      (6L, 2500L, 1L, "click"),
      (7L, 4000L, 2L, "view"),
      (8L, 9000L, 1L, "buy"), (9L, 9500L, 2L, "click"))
    val batches = Seq(all.take(5), all.slice(5, 7), all.drop(7))

    val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelEvent](spark)
    val q = funnelStream(events.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("update").start()
    var fed = Seq.empty[(Long, Long, Long, String)]
    batches.foreach { b =>
      events.addData(b.map { case (id, us, u, t) => FunnelEvent(u, ts(us), id, t) })
      q.processAllAvailable()
      fed ++= b
      // batch twin over everything fed so far: per-user chains via the
      // SAME greedy rule, computed by graft.operators.Funnel's fold
      val batchChains = fed.groupBy(_._3).map { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._1))
        val chain = sorted.foldLeft(Seq.fill(3)(-1L)) { (c, e) =>
          c.zipWithIndex.map { case (t, i) =>
            if (t >= 0) t
            else if (e._4 == steps(i) && (i == 0 || (c(i - 1) >= 0 && e._2 > c(i - 1))))
              e._2
            else -1L
          }
        }
        u -> chain
      }
      val streamed = spark.table("funnel_state").as[FunnelUpdate].collect()
        .groupBy(_.userId).map { case (u, us) => u -> us.last.chainUs }
      streamed.foreach { case (u, chain) =>
        assert(chain == batchChains(u), s"user $u diverged after this batch")
      }
    }
    q.stop()
    val last = spark.table("funnel_state").as[FunnelUpdate].collect()
      .groupBy(_.userId).map { case (u, us) => u -> us.last }
    assert(last(1L).stepsReached == 3, "user 1 completes")
    assert(last(2L).stepsReached == 2,
      "user 2: the pre-view click never chains; the later one does")
    assert(last(3L).stepsReached == 1, "user 3: same-µs click is not strictly after")
  }
}
