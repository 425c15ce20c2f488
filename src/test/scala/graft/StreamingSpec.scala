package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming transforms through MemoryStream and checks the
  * streaming results against the same transform applied in batch (the
  * unified-API contract), plus watermark-dedup and keyed-state behavior.
  */
/** documents-shaped record for streaming the curation transforms. */
case class StreamDoc(doc_id: Long, text: String, lang: String,
                     source: String, n_chars: Long)

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample: Seq[Ev] = Seq(
    Ev(1, ts(5), 1, "click", 1.0),
    Ev(2, ts(20), 1, "click", 2.0),
    Ev(3, ts(65), 2, "error", 3.0),
    Ev(4, ts(70), 1, "click", 4.0),
    Ev(5, ts(130), 2, "click", 5.0))

  test("windowed counts: streaming result equals the batch result") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(sample: _*)
    Streams.runToMemory(Streams.windowedCounts(mem.toDF()),
      "win_sink", OutputMode.Complete())
    val streamed = spark.table("win_sink")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = Streams.windowedCounts(sample.toDF())
      .orderBy("wstart", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(batch.map(_.getAs[Long]("n")).sum === sample.size)
  }

  test("transformWithState keeps typed per-key state across micro-batches") {
    import spark.implicits._
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      // the transformWithState API requires the RocksDB state store —
      // the disk-spilling provider unbounded keyed state needs anyway.
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[Ev](spark)
      mem.addData(sample.take(3): _*)
      val q = Streams.runningCounts(mem.toDS()).toDF().writeStream
        .format("memory").queryName("tws_sink")
        .outputMode(OutputMode.Update()).start()
      q.processAllAvailable()
      mem.addData(sample.drop(3): _*) // second batch: state must carry
      q.processAllAvailable()
      q.stop()
      // last emitted count per user == total batch count per user
      val last = spark.table("tws_sink")
        .groupBy("user_id").agg(max("n").as("n"))
        .orderBy("user_id").collect().toSeq
      val batch = sample.toDF().groupBy("user_id")
        .agg(count(lit(1)).as("n")).orderBy("user_id").collect().toSeq
      assert(last === batch)
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }

  test("Trigger.AvailableNow drains the backlog and terminates") {
    // the catch-up trigger for scheduled (not 24/7) pipelines: process
    // everything available in bounded batches, then STOP — same results
    // as continuous micro-batching, no long-lived cluster reservation.
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(sample: _*)
    val q = Streams.windowedCounts(mem.toDF()).writeStream
      .format("memory").queryName("avail_now_sink")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    val streamed = spark.table("avail_now_sink")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = Streams.windowedCounts(sample.toDF())
      .orderBy("wstart", "event_type").collect().toSeq
    assert(streamed === batch)
  }

  test("streaming PII redaction equals batch redaction across micro-batches") {
    // curation ops built from stateless per-row expressions run
    // UNCHANGED on a stream — the batch/stream-unified contract that
    // lets one redaction codebase serve backfill and live ingest. Two
    // micro-batches prove no cross-batch state sneaks in.
    import spark.implicits._
    val first = Seq(
      StreamDoc(10L, "reach out at any time", "en", "src0", 21L),
      StreamDoc(11L, "the quick brown fox", "en", "src1", 19L),
      StreamDoc(12L, "der schnelle braune fuchs", "de", "src2", 25L))
    val second = Seq(
      StreamDoc(13L, "le renard brun rapide", "fr", "src3", 21L))
    val mem = MemoryStream[StreamDoc](spark)
    mem.addData(first: _*)
    val q = ops.Curation.redactTransform(mem.toDF()).writeStream
      .format("memory").queryName("redact_sink")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("redact_sink").orderBy("doc_id").collect().toSeq
    val batch = ops.Curation.redact((first ++ second).toDF()).collect().toSeq
    assert(streamed === batch)
    // and the redaction actually fired on every row.
    streamed.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1L && r.getAs[Long]("n_phones") >= 1L)
      assert(r.getAs[String]("redacted_head").contains("<EMAIL>"))
    }
  }

  test("streaming dedup drops event_id replays") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(sample: _*)
    mem.addData(sample.take(3): _*) // replay three events
    Streams.runToMemory(Streams.dedupedEvents(mem.toDF()),
      "dedup_sink", OutputMode.Append())
    assert(spark.table("dedup_sink").count() === sample.size)
  }

  test("sliding windows assign each event to window/slide slots") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(sample: _*)
    Streams.runToMemory(Streams.slidingUserRate(mem.toDF()),
      "slide_sink", OutputMode.Complete())
    val rows = spark.table("slide_sink").collect()
    // 1h window sliding every 15min ⇒ every event lands in 4 slots.
    assert(rows.map(_.getAs[Long]("n_events")).sum === sample.size * 4)
  }

  test("mapGroupsWithState accumulates per-user session state") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(sample: _*)
    val q = Streams.sessionize(mem.toDS()).writeStream
      .format("memory").queryName("sess_sink").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()
    val byUser = spark.table("sess_sink").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(byUser(1L) === ((3L, 7.0)))
    assert(byUser(2L) === ((2L, 8.0)))
  }

  test("session_window streaming: append emits finalized sessions") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    // user 1: session A (00:05, 00:10), then >30min gap, session B (01:30).
    mem.addData(
      Ev(1, ts(5), 1, "click", 1.0),
      Ev(2, ts(10), 1, "click", 1.0),
      Ev(3, ts(90), 1, "click", 1.0))
    val q = Streams.sessionWindowCounts(mem.toDF()).writeStream
      .format("memory").queryName("swin_sink").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // far-future event pushes the watermark past both sessions' close.
    mem.addData(Ev(99, ts(600), 2, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("swin_sink").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events"))).toSet
    assert(got.contains((1L, ts(5), 2L)), s"session A missing from $got")
    assert(got.contains((1L, ts(90), 1L)), s"session B missing from $got")
  }

  test("flatMapGroupsWithState emits closed sessions on event-time timeout") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(
      Ev(1, ts(5), 1, "click", 1.0),
      Ev(2, ts(10), 1, "click", 1.0),
      Ev(3, ts(90), 1, "click", 1.0), // in-batch gap closes session A at once
      Ev(4, ts(90), 2, "click", 1.0))
    val q = Streams.closedSessions(mem.toDS()).writeStream
      .format("memory").queryName("closed_sink").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // watermark jump fires the event-time timeout for the open sessions.
    mem.addData(Ev(99, ts(600), 3, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("closed_sink").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSet
    assert(got.contains((1L, ts(5), ts(10), 2L)), s"in-batch-closed session missing: $got")
    assert(got.contains((1L, ts(90), ts(90), 1L)), s"timeout-closed session missing: $got")
    assert(got.contains((2L, ts(90), ts(90), 1L)), s"user-2 session missing: $got")
  }

  test("stream-stream interval join equals the batch join") {
    import spark.implicits._
    val clicks = Seq(
      Ev(1, ts(70), 2, "click", 1.0), // pairs with error 3 (5 min earlier)
      Ev(2, ts(20), 1, "click", 1.0)) // pairs with error 5 (10 min earlier)
    val errors = Seq(
      Ev(3, ts(65), 2, "error", 1.0),
      Ev(4, ts(135), 2, "error", 1.0), // after the click → no match
      Ev(5, ts(10), 1, "error", 1.0))
    val memC = MemoryStream[Ev](spark); memC.addData(clicks: _*)
    val memE = MemoryStream[Ev](spark); memE.addData(errors: _*)
    Streams.runToMemory(Streams.intervalJoin(memC.toDF(), memE.toDF()),
      "join_sink", OutputMode.Append())
    val streamed = spark.table("join_sink")
      .orderBy("left_id", "right_id").collect().toSeq
    val batch = Streams.intervalJoin(clicks.toDF(), errors.toDF())
      .orderBy("left_id", "right_id").collect().toSeq
    assert(streamed === batch)
    assert(batch.map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
      === Seq((1L, 3L), (2L, 5L)))
  }

  test("foreachBatch writes idempotent per-batch tables through the V2 sink") {
    import spark.implicits._
    def batch0() = spark.read.format("graft.sources.MemTableSource")
      .option("name", "fb_spec_b0").load()
    val mem = MemoryStream[Ev](spark)
    mem.addData(sample: _*)
    Streams.foreachBatchToMem(mem.toDF(), "fb_spec")
    assert(batch0().count() === sample.size)
    // replay: a fresh checkpoint-free query reprocesses everything as
    // batch 0 again — the id-keyed overwrite makes the replay IDEMPOTENT
    // (still one copy) where a plain append sink would double the rows.
    Streams.foreachBatchToMem(mem.toDF(), "fb_spec")
    assert(batch0().count() === sample.size)
    assert(batch0().select("event_id").orderBy("event_id").as[Long].collect().toSeq
      === sample.map(_.event_id).sorted)
    graft.sources.MemStore.drop("fb_spec_b0")
  }

  test("batch events table flows through the same windowed transform") {
    // unified API: the exact transform used on streams runs on the real
    // events table, matching q48-style totals.
    val out = Streams.windowedCounts(
      Tables.events(spark, sf).withColumn("ts", col("ts")))
    assert(out.agg(sum("n")).collect().head.getLong(0) ===
      Tables.events(spark, sf).count())
  }
}
