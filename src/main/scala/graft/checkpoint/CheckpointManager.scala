package graft.checkpoint

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-style checkpoint/resume layer: Parquet data files plus a JSON
 * manifest per superstep carrying iteration metrics and per-partition
 * lineage (row counts per partition). The real Iceberg runtime jar is
 * not available offline, so this implements the same snapshot+manifest
 * contract on plain files; swap for Iceberg commits when the jar exists.
 *
 * Layout: {root}/{algo}/iter={n}/data/ (parquet files)
 *         {root}/{algo}/iter={n}/manifest.json   (written last = commit)
 *
 * A superstep directory without manifest.json is an uncommitted torn
 * write and is ignored on resume.
 */
final class CheckpointManager(val root: String, spark: SparkSession) {

  // Hadoop FS API, not java.nio: the checkpoint root may be HDFS / S3A
  // / any Hadoop-supported scheme on a real cluster; plain local paths
  // resolve to the local FS in the sandbox.
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stepDir(algo: String, iter: Int): Path =
    new Path(new Path(root, algo), f"iter=$iter%05d")

  /**
   * Commit one superstep: data first, manifest last. Returns the
   * re-read DataFrame (fresh lineage — this is what breaks logical-plan
   * growth in iterative algorithms).
   */
  def commit(
      algo: String,
      iter: Int,
      state: DataFrame,
      metrics: Map[String, Double],
      fingerprint: String = ""): DataFrame = {
    val dir = stepDir(algo, iter)
    val dataDir = new Path(dir, "data").toString
    state.write.mode("overwrite").parquet(dataDir)

    // Per-partition lineage: rows per output file of this snapshot.
    val reread = spark.read.parquet(dataDir)
    val partCounts = reread
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
      .collect()
      .map(r => Json.obj(
        "file" -> Json.str(r.getString(0)),
        "rows" -> Json.num(r.getLong(1).toDouble)))

    val manifest = Json.obj(
      "algo" -> Json.str(algo),
      "iteration" -> Json.num(iter.toDouble),
      "fingerprint" -> Json.str(fingerprint),
      "schema" -> Json.str(state.schema.json),
      "metrics" -> Json.obj(metrics.toSeq.map { case (k, v) => k -> Json.num(v) }: _*),
      "partitions" -> Json.arr(partCounts.toIndexedSeq: _*))
    val mPath = new Path(dir, "manifest.json")
    val out = fs(mPath).create(mPath, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    reread
  }

  /** Latest committed iteration for `algo`, if any. When `fingerprint`
   * is non-empty, only manifests committed with the SAME fingerprint
   * count — a checkpoint root reused for a different graph / source
   * set / config is ignored instead of silently resuming stale state
   * into wrong results. */
  def latestIteration(algo: String, fingerprint: String = ""): Option[Int] = {
    val d = new Path(root, algo)
    val f = fs(d)
    if (!f.exists(d) || !f.getFileStatus(d).isDirectory) return None
    val iters = f.listStatus(d).toSeq
      .filter(st => st.getPath.getName.startsWith("iter=") &&
        f.exists(new Path(st.getPath, "manifest.json")))
      .map(_.getPath.getName.stripPrefix("iter=").toInt)
      .filter(it => fingerprint.isEmpty ||
        manifestFingerprint(algo, it).contains(fingerprint))
    if (iters.isEmpty) None else Some(iters.max)
  }

  /** Fingerprint recorded in a committed manifest (None if absent). */
  def manifestFingerprint(algo: String, iter: Int): Option[String] = {
    val m = manifestJson(algo, iter)
    "\"fingerprint\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(m).map(_.group(1)).filter(_.nonEmpty)
  }

  /** Re-open the committed state of (algo, iter). */
  def restore(algo: String, iter: Int): DataFrame =
    spark.read.parquet(new Path(stepDir(algo, iter), "data").toString)

  /** Order-independent fingerprint of a run's inputs: edge-set hash +
   * row count + caller extras (sources, key config). One aggregation
   * over the (usually cached) edge table, computed once per run; the
   * cost buys refusal to resume a checkpoint of a DIFFERENT graph. */
  def graphFingerprint(edges: DataFrame, extras: String*): String = {
    val cols = edges.columns.sorted.map(col)
    val r = edges
      .agg(count(lit(1)).as("n"),
        sum(hash(cols: _*).cast("long")).as("h"))
      .head()
    val n = r.getLong(0)
    val h = if (r.isNullAt(1)) 0L else r.getLong(1)
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$n:$h:${extras.mkString(":")}"
        .getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  def manifestJson(algo: String, iter: Int): String = {
    val mPath = new Path(stepDir(algo, iter), "manifest.json")
    val in = fs(mPath).open(mPath)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }
}

/** Minimal JSON writer (no external deps in the offline sandbox). */
private[graft] object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // bare NaN/Infinity is invalid JSON
    else if (d == d.toLong.toDouble) d.toLong.toString
    else d.toString
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")
  def arr(items: String*): String = items.mkString("[", ",", "]")
}
