package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming layer over the events table. The reference is
 * batch-only (SURVEY.md §2.h — no streams exist in cuGraph); this is
 * part of the training-data-pipeline surface: the same transformations
 * run identically over a static DataFrame (verifiable against the
 * DuckDB oracle) and over readStream input (verified incrementally in
 * the streaming spec).
 */
object EventStream {

  /** Tumbling-window counts per event type. Window key is an integer
   * hour bucket of the event timestamp (epoch microseconds / 3600e6) —
   * portable to the SQL oracle, identical in batch and streaming. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      // ts arrives as TimestampNTZ; under the pinned UTC session the
      // cast is instant-preserving and matches DuckDB's epoch_us.
      .withColumn("hour_bucket",
        (unix_micros(col("ts").cast("timestamp")) / lit(3600000000L))
          .cast("long"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 1e6, 0).cast("long").as("sum_value_micro"))

  /** Event-time windowed aggregation with watermark — the streaming
   * form (native window() + watermark so late data is handled). */
  def streamingWindowCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Streaming exact dedup on event_id within the watermark horizon. */
  def dedupedStream(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Per-user sessionization via the native merging session-window
   * aggregation — the training-pipeline op that groups a user's events
   * into activity sessions separated by >= `gap` of silence. Spark's
   * `session_window` merges an event into the open session iff its
   * timestamp lands strictly before session_end = last_ts + gap, i.e.
   * a new session starts exactly when the gap is >= `gap` — the SQL
   * oracle reconstructs the same grouping with a lag-based running
   * flag sum. Chosen over a per-user ORDER BY window in our own code:
   * the built-in session aggregation is a merging (partial-combinable)
   * operator, not a single-task sort of a mega-user's history.
   * Output: (user_id, session_start_us, session_end_us, n,
   * sum_value_micro); timestamps exported as epoch micros so the hash
   * compare is timezone- and float-proof. */
  def sessionize(events: DataFrame, gap: String = "8 hours"): DataFrame = {
    val ts = events.withColumn("ts", col("ts").cast("timestamp"))
    // Streaming session windows need an event-time watermark to bound
    // state; batch mode must NOT carry one (it would be a no-op node).
    val src = if (ts.isStreaming) ts.withWatermark("ts", "1 hour") else ts
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n"),
        round(sum(col("value")) * 1e6, 0).cast("long").as("sum_value_micro"))
      .select("user_id", "session_start_us", "session_end_us", "n",
        "sum_value_micro")
  }

  final case class UserAgg(user_id: Long, n: Long, total: Double, last_ts: Timestamp)

  /** Custom streaming state: running per-user event count/total via
   * mapGroupsWithState (the KeyValueGroupedDataset state API). */
  def perUserRunningAgg(events: DataFrame): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value", "CAST(ts AS TIMESTAMP) AS ts")
      .as[(Long, Double, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0, new Timestamp(0L)))
          var n = prev.n
          var total = prev.total
          var last = prev.last_ts
          rows.foreach { case (_, v, ts) =>
            n += 1; total += v
            if (ts.after(last)) last = ts
          }
          val cur = UserAgg(uid, n, total, last)
          state.update(cur)
          cur
      }
  }
}
