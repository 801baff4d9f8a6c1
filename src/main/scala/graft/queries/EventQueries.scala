package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Batch form of the streaming transformations over the shared events
 * table — the same code paths StreamingSpec runs incrementally. */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_hourly" -> ((s, dir) =>
      EventStream.hourlyTypeCounts(s.read.parquet(s"$dir/events.parquet"))),

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
    "q_events_hourly" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |  count(*) AS n,
        |  CAST(round(sum(value) * 1e6, 0) AS BIGINT) AS sum_value_micro
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_events_user_top" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(round(sum(value) * 1e6, 0) AS BIGINT) AS sum_value_micro
        |FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id LIMIT 20""".stripMargin
  )
}
