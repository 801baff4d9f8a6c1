package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * MatrixMarket coordinate reader/writer (reference test utility
 * `/root/reference/cpp/tests/utilities/matrix_market_file_utilities.cu`;
 * the reference's datasets ship as .mtx). Test-convenience format —
 * the production path is parquet — but the READ side is still
 * distributed: only the header (first non-comment line) is read
 * driver-side; the body is parsed as a Spark text scan, so a large
 * .mtx ingests in parallel.
 *
 * Coordinate format: '%' comment lines, then "rows cols nnz", then
 * one "i j [w]" line per entry, 1-indexed. We emit 0-indexed
 * (src, dst, weight); a missing weight (pattern matrices) reads
 * as 1.0, like the reference's mm_to_coo.
 */
object Mtx {

  /** Read a coordinate .mtx into an edge DataFrame (src, dst, weight). */
  def read(spark: SparkSession, path: String): DataFrame = {
    // Header: first non-comment line, read driver-side (bounded work —
    // comments and the size line only).
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val header =
      try src.getLines().find(l => l.nonEmpty && !l.startsWith("%"))
        .getOrElse(sys.error(s"$path: no MatrixMarket header line"))
      finally src.close()

    // Body: distributed scan; drop comments, drop ONE header occurrence
    // by global line number (zipWithIndex preserves text-file order).
    val lines = spark.read.text(path).rdd
      .zipWithIndex()
      .map { case (row, idx) => (idx, row.getString(0)) }
    val headerIdx = lines.filter { case (_, l) =>
      l.nonEmpty && !l.startsWith("%")
    }.map(_._1).min()
    import spark.implicits._
    val body = lines.filter { case (idx, l) =>
      idx > headerIdx && l.nonEmpty && !l.startsWith("%")
    }.map(_._2).toDF("line")

    body.select(split(trim(col("line")), "\\s+").as("f"))
      .select(
        (element_at(col("f"), 1).cast("long") - 1).as("src"),
        (element_at(col("f"), 2).cast("long") - 1).as("dst"),
        coalesce(try_element_at(col("f"), lit(3)).cast("double"), lit(1.0))
          .as("weight"))
  }

  /** Write edges as a single coordinate .mtx file (test sizes only —
   * the body is produced distributed, then stitched with the header
   * into one file, since MatrixMarket is a single-file format). */
  def write(edges: DataFrame, path: String): Unit = {
    val spark = edges.sparkSession
    val stats = edges.agg(
      max(greatest(col("src"), col("dst"))).as("mx"),
      count(lit(1)).as("nnz")).head()
    val n = stats.getLong(0) + 1
    val nnz = stats.getLong(1)

    val tmp = path + ".body"
    edges
      .orderBy("src", "dst")
      .select(concat_ws(" ",
        col("src") + 1, col("dst") + 1, col("weight")).as("line"))
      .coalesce(1)
      .write.mode("overwrite").text(tmp)

    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString
      .startsWith("part-")).findFirst().get()
    val out = Paths.get(path)
    Files.deleteIfExists(out)
    val headerBytes =
      s"%%MatrixMarket matrix coordinate real general\n$n $n $nnz\n"
        .getBytes(StandardCharsets.UTF_8)
    Files.write(out, headerBytes)
    Files.write(out, Files.readAllBytes(part),
      java.nio.file.StandardOpenOption.APPEND)
    // clean the body dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    ()
  }
}
