package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media payloads ride as opaque `binary`
 * columns with typed metadata beside them, the standard layout for
 * image/audio/video at 100 TB (payload bytes never pass through
 * row-level Scala; metadata extraction and frame addressing are
 * column expressions).
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * container): [[stubDecode]] derives deterministic pseudo-metadata
 * from the payload bytes via md5 — the schema, partitioning, and
 * batch shape of the pipeline are real and tested, and the stub has
 * a clearly-marked seam where a real decoder (e.g. an
 * `mapInPandas`-style vectorized UDF or a JNI codec) plugs in.
 */
object Multimodal {

  /** Wrap text docs as a fake media table: (id, media blob, media_type),
   * deterministic; stands in for a real (image|audio|video) column. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("media"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"))

  /**
   * STUB decoder: real implementations replace the hash-derived fields
   * with codec output. Every field is a pure function of the payload
   * bytes, so the pipeline around it is fully testable.
   */
  def stubDecode(media: DataFrame, idCol: String): DataFrame = {
    val payload = col("media")
    val h = md5(payload) // stands in for decoded-content inspection
    media.select(
      col(idCol),
      col("media_type"),
      length(payload).cast("long").as("n_bytes"),
      // --- stub seam: replace from here with a real codec ---
      (conv(substring(h, 1, 6), 16, 10).cast("long") % 1920L + 1L)
        .as("width"),
      (conv(substring(h, 7, 6), 16, 10).cast("long") % 1080L + 1L)
        .as("height"),
      (conv(substring(h, 13, 6), 16, 10).cast("long") % 600L + 1L)
        .as("duration_s"),
      h.as("content_hash"))
  }

  /** Frame sampling plan: every `stepS` seconds of each video, as rows
   * (id, frame_ts_s) — the explode-side of a frame-extraction stage. */
  def sampleFrames(decoded: DataFrame, idCol: String, stepS: Int): DataFrame =
    decoded
      .filter(col("media_type") === "video/mp4")
      .select(col(idCol),
        explode(sequence(lit(0L), col("duration_s") - 1, lit(stepS.toLong)))
          .as("frame_ts_s"))

  /** Deterministic stub feature vector (dim `d`) per media row — the
   * shape a real embedding model would produce; pure function of the
   * content hash. */
  def stubFeatures(decoded: DataFrame, idCol: String, d: Int = 8): DataFrame =
    decoded.select(col(idCol),
      array((0 until d).map { i =>
        (conv(substring(md5(concat(col("content_hash"), lit(s":$i"))), 1, 8),
          16, 10).cast("double") / 4294967296.0)
      }: _*).as("features"))
}
