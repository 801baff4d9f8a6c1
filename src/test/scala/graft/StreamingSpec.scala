package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The streaming file source needs a DIRECTORY; the shared events
   * table is a single parquet file — stage it into a temp dir. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("hourlyTypeCounts: identical results on batch and stream input") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val want = EventStream.hourlyTypeCounts(batch).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(eventsDir)
    val q = EventStream.hourlyTypeCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_counts")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_counts").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("watermarked window agg runs on stream") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(batch.schema)
      .parquet(eventsDir)
    val q = EventStream.streamingWindowCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_counts")
      assert(got.count() > 0)
      // total events preserved across windows
      assert(got.agg(sum("n")).head().getLong(0) == batch.count())
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    // duplicate the input: dedup must restore original count
    val dir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    batch.union(batch).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = EventStream.dedupedStream(stream)
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_count").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_count").head().getLong(0) == batch.count())
    } finally q.stop()
  }

  test("sessionize: identical sessions on batch and stream input") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))
    val want = EventStream.sessionize(batch).collect().map(key).toMap
    assert(want.nonEmpty && want.size < batch.count())
    assert(want.exists(_._2._2 > 1)) // the 8h gap actually merges events

    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(eventsDir)
    val q = EventStream.sessionize(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions").collect().map(key).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("mapGroupsWithState per-user running aggregate") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(batch.schema)
      .parquet(eventsDir)
    val q = EventStream.perUserRunningAgg(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_agg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("user_agg")
        .groupBy("user_id").agg(max("n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = batch.groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally q.stop()
  }
}
