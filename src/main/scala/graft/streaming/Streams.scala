package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming transforms (builder brief; the reference has no
  * streaming at all — README.md:36-38 scopes it out — so this is
  * capability the Spark re-expression adds for free). Each transform is
  * a pure Dataset→Dataset function usable identically on a batch frame
  * or a readStream frame; StreamingSpec drives them through
  * MemoryStream with event-time data shaped like the events table.
  *
  * Scale notes: watermarking bounds state (late events beyond 10 min are
  * dropped, windows close and evict); state in sessionize is per-user —
  * keyed state scales horizontally with the shuffle partition count.
  */
object Streams {

  /** Event-time tumbling-window aggregation with a 10-minute watermark:
    * the streaming twin of q48 (batch window()).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("v"))

  /** Sliding-window per-user rate (1 hour window, 15 min slide). */
  def slidingUserRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("wstart"), col("user_id"), col("n_events"))

  /** Streaming dedup with BOUNDED state: event_id replays arriving
    * within the watermark delay are dropped, and Spark evicts each key's
    * state once the watermark passes it. Plain `dropDuplicates(id)`
    * without the event-time column would keep every id forever (state
    * grows unboundedly); `dropDuplicatesWithinWatermark` is the
    * state-evicting form.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  final case class Ev(event_id: Long, ts: java.sql.Timestamp,
                      user_id: Long, event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long,
                                  total_value: Double)

  /** Custom keyed state via mapGroupsWithState: per-user counters that
    * accumulate across micro-batches — the KeyValueGroupedDataset state
    * API from the brief. State is per-key and partition-local, so it
    * scales with the shuffle partition count; production variants add a
    * GroupStateTimeout to evict idle keys and bound state size.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), SessionSummary](
        GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          evs.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          SessionSummary(userId, n, v)
      }
  }

  /** Native streaming sessionization: session_window merges events
    * closer than the gap; with a watermark, state for a session is
    * evicted once the watermark passes its close — the managed-state
    * twin of [[closedSessions]]. Append mode emits each session exactly
    * once, when it can no longer grow.
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  final case class SessionAcc(start: Long, end: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp, n_events: Long)

  /** Hand-rolled sessionization via flatMapGroupsWithState with an
    * EVENT-TIME timeout — the fully general keyed-state form for
    * session logic session_window can't express (custom merge rules,
    * emitting mid-session heartbeats, …). Sessions closed by an
    * in-batch gap are emitted immediately; the still-open tail session
    * is parked in state with a timeout at end+gap, so the watermark
    * passing that point fires the timeout branch and emits it. State is
    * one (start, end, n) triple per active user — bounded, and evicted
    * on close.
    */
  def closedSessions(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, _, state) if state.hasTimedOut =>
          val s = state.get
          state.remove()
          Iterator(ClosedSession(uid, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.end), s.n))
        case (uid, evs, state) =>
          var closed = List.empty[SessionAcc]
          var cur = state.getOption.orNull
          evs.map(_.ts.getTime).toArray.sorted.foreach { t =>
            if (cur == null) cur = SessionAcc(t, t, 1)
            else if (t - cur.end >= gapMs) { closed ::= cur; cur = SessionAcc(t, t, 1) }
            else cur = SessionAcc(math.min(cur.start, t), math.max(cur.end, t), cur.n + 1)
          }
          val wm = state.getCurrentWatermarkMs()
          if (cur != null && cur.end + gapMs <= wm) { closed ::= cur; cur = null }
          if (cur != null) {
            state.update(cur)
            state.setTimeoutTimestamp(cur.end + gapMs)
          } else state.remove()
          closed.reverse.iterator.map(s =>
            ClosedSession(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
      }
  }

  /** Watermarked stream-stream interval join: each left event pairs
    * with same-user right events from the preceding hour. The time
    * bound plus both watermarks let Spark evict buffered rows once they
    * can no longer match — without them a stream-stream join buffers
    * forever. The same function joins two batch frames identically.
    */
  def intervalJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "10 minutes").alias("l")
    val r = right.withWatermark("ts", "1 hour").alias("r")
    l.join(r, expr(
      """l.user_id = r.user_id AND
        |r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts AND
        |l.event_id != r.event_id""".stripMargin))
      .select(col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col("l.user_id").as("user_id"),
        col("l.ts").as("left_ts"), col("r.ts").as("right_ts"))
  }

  /** Streaming → batch-sink bridge: foreachBatch hands every micro-batch
    * to a batch writer together with its batchId. Writing each batch to
    * an id-keyed target with an atomic commit (here: overwrite of
    * `<table>_b<batchId>` through the V2 MemTableSource, whose driver-side
    * commit installs rows all-or-nothing) makes a replayed batch
    * overwrite itself rather than duplicate — the standard recipe for
    * effectively-exactly-once delivery into sinks with no native
    * streaming support.
    */
  def foreachBatchToMem(df: DataFrame, table: String): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.format("graft.sources.MemTableSource")
          .option("name", s"${table}_b$batchId")
          .mode("overwrite").save()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Wire a streaming frame of events through `transform` into an
    * in-memory sink table named `sinkName`, complete/update handled by
    * the caller's OutputMode.
    */
  final case class UserCount(user_id: Long, n: Long)

  /** Spark 4 arbitrary-state API (`transformWithState`): the successor
    * to mapGroupsWithState — typed state handles (value/list/map) with
    * per-state TTL, timers, and schema evolution, backed by the RocksDB
    * state store (required by the API; local heap state stops at a few
    * GB per executor, RocksDB spills keyed state to disk, which is what
    * unbounded-key streams need at 100 TB). This processor keeps one
    * running per-user event counter.
    */
  final class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserCount] {
    @transient private var count:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserCount] = {
      val c = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(c)
      Iterator.single(UserCount(key, c))
    }
  }

  /** Per-user running counts through transformWithState. */
  def runningCounts(events: Dataset[Ev]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  def runToMemory(transformed: DataFrame, sinkName: String,
                  mode: OutputMode): Unit = {
    val q = transformed.writeStream
      .format("memory").queryName(sinkName).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }
}
