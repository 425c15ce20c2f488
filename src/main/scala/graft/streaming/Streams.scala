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

  /** Wire a streaming frame of events through `transform` into an
    * in-memory sink table named `sinkName`, complete/update handled by
    * the caller's OutputMode.
    */
  def runToMemory(transformed: DataFrame, sinkName: String,
                  mode: OutputMode): Unit = {
    val q = transformed.writeStream
      .format("memory").queryName(sinkName).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }
}
