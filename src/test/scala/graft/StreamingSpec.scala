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

  test("batch events table flows through the same windowed transform") {
    // unified API: the exact transform used on streams runs on the real
    // events table, matching q48-style totals.
    val out = Streams.windowedCounts(
      Tables.events(spark, sf).withColumn("ts", col("ts")))
    assert(out.agg(sum("n")).collect().head.getLong(0) ===
      Tables.events(spark, sf).count())
  }
}
