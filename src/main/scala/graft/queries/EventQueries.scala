package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hypergraph
import graft.streaming.EventStream

/** Batch form of the streaming transformations over the shared events
 * table — the same code paths StreamingSpec runs incrementally. */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_hourly" -> ((s, dir) =>
      EventStream.hourlyTypeCounts(s.read.parquet(s"$dir/events.parquet"))),

    // Hypergraph lift of the events table (reference hypergraph.py:42):
    // INDIRECT mode — each event row links to its user_id / event_type
    // attribute nodes through an event hypernode.
    "q_hypergraph" -> ((s, dir) =>
      Hypergraph.transform(
        s.read.parquet(s"$dir/events.parquet"),
        columns = Seq("user_id", "event_type"), eventId = "event_id").edges),

    // DIRECT mode — attribute nodes connect pairwise (user_id→event_type),
    // deduped with a per-pair row count.
    "q_hypergraph_direct" -> ((s, dir) =>
      Hypergraph.transform(
        s.read.parquet(s"$dir/events.parquet"),
        columns = Seq("user_id", "event_type"), eventId = "event_id",
        direct = true).edges),

    "q_events_sessions" -> ((s, dir) =>
      // Per-user activity sessions, 8-hour inactivity gap (~median
      // per-user event spacing, so the gap BINDS: real merging, not
      // one session per event or per user).
      EventStream.sessionize(s.read.parquet(s"$dir/events.parquet"))),

    "q_events_user_top" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
      e.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")) * 1e6, 0).cast("long").as("sum_value_micro"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_hypergraph" ->
      """SELECT 'event_id::' || CAST(event_id AS VARCHAR) AS src,
        |  'user_id::' || CAST(user_id AS VARCHAR) AS dst,
        |  'user_id' AS edge_type
        |FROM events WHERE user_id IS NOT NULL
        |UNION ALL
        |SELECT 'event_id::' || CAST(event_id AS VARCHAR),
        |  'event_type::' || event_type, 'event_type'
        |FROM events WHERE event_type IS NOT NULL""".stripMargin,

    "q_hypergraph_direct" ->
      """SELECT 'user_id::' || CAST(user_id AS VARCHAR) AS src,
        |  'event_type::' || event_type AS dst,
        |  'user_id::event_type' AS edge_type, count(*) AS n_rows
        |FROM events
        |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_events_hourly" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |  count(*) AS n,
        |  CAST(round(sum(value) * 1e6, 0) AS BIGINT) AS sum_value_micro
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Lag-based reconstruction of session_window semantics: a new
    // session starts when the gap since the previous event is >= the
    // 8-hour threshold (Spark merges strictly-inside events only).
    "q_events_sessions" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS tus, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY epoch_us(ts))
        |           >= 28800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events
        |), s AS (
        |  SELECT user_id, tus, value,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(tus) AS session_start_us,
        |  max(tus) AS session_end_us, count(*) AS n,
        |  CAST(round(sum(value) * 1e6, 0) AS BIGINT) AS sum_value_micro
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_events_user_top" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(round(sum(value) * 1e6, 0) AS BIGINT) AS sum_value_micro
        |FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id LIMIT 20""".stripMargin
  )
}
