package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Simple deterministic graph generators (reference
 * `/root/reference/cpp/src/generators/simple_generators.cu` — path,
 * 2D mesh, complete graph — plus an Erdős–Rényi generator,
 * `/root/reference/cpp/src/generators/erdos_renyi_generator.cu`).
 *
 * All generators are spark.range-based: the edge list is produced
 * distributed with no driver materialization, so any size fits the
 * cluster (range is split across partitions). Edges are directed
 * canonical (src < dst for complete/ER); symmetrize() for the
 * undirected view, as with the reference's generators.
 */
object Generators {

  /** Path graph 0→1→…→n-1 (reference simple_generators.cu path). */
  def path(spark: SparkSession, n: Long): DataFrame =
    spark.range(n - 1).select(
      col("id").as("src"), (col("id") + 1).as("dst"))

  /** Complete graph on n vertices, canonical direction src < dst. */
  def complete(spark: SparkSession, n: Long): DataFrame = {
    val v = spark.range(n)
    v.select(col("id").as("src"))
      .join(v.select(col("id").as("dst")), col("src") < col("dst"))
  }

  /** Star: center 0 → spokes 1..n-1. */
  def star(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n).select(lit(0L).as("src"), col("id").as("dst"))

  /** 2D mesh rows×cols, vertex r*cols+c, right + down neighbors
   * (reference simple_generators.cu 2d mesh). */
  def grid2d(spark: SparkSession, rows: Long, cols: Long): DataFrame = {
    val v = spark.range(rows * cols)
      .select(col("id"), (col("id") / cols).cast("long").as("r"),
        pmod(col("id"), lit(cols)).as("c"))
    val right = v.filter(col("c") < cols - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val down = v.filter(col("r") < rows - 1)
      .select(col("id").as("src"), (col("id") + cols).as("dst"))
    right.union(down)
  }

  /** G(n, p) with a deterministic counter-based coin: pair (i, j),
   * i < j, is an edge iff md5(seed:i:j) as a 32-bit int mod 10^6
   * < p·10^6 — splittable, partition-invariant, and reproducible by
   * the SQL oracle (same scheme as the pinned random walks). The
   * pair space is enumerated distributed (range ⋈ range); for large n
   * prefer [[Rmat]], as the reference does. */
  def erdosRenyi(spark: SparkSession, n: Long, p: Double, seed: Long): DataFrame = {
    val v = spark.range(n)
    val pairs = v.select(col("id").as("src"))
      .join(v.select(col("id").as("dst")), col("src") < col("dst"))
    val coin = pmod(conv(substring(
      md5(concat_ws(":", lit(seed), col("src"), col("dst"))), 1, 8),
      16, 10).cast("long"), lit(1000000L))
    pairs.filter(coin < math.round(p * 1e6))
  }

  /**
   * Multiple RMAT edge lists in one tagged frame — reference multi_rmat
   * (`/root/reference/python/cugraph/cugraph/generators/rmat.py:343`:
   * n graphs with scales drawn from [minScale, maxScale], uniform
   * size distribution). Scales and per-graph seeds are pure functions
   * of (seed, graph index) via splitmix64, so generation stays
   * splittable across any partitioning; each graph's edges come from
   * one `spark.range` over its edge indices (no driver
   * materialization). Returns (graph_id, src, dst).
   */
  def multiRmat(
      spark: SparkSession,
      nGraphs: Int,
      minScale: Int,
      maxScale: Int,
      edgeFactor: Int,
      seed: Long): DataFrame = {
    require(nGraphs > 0 && minScale <= maxScale && minScale > 0)
    import spark.implicits._
    (0 until nGraphs).map { i =>
      val scale = minScale + Math.floorMod(
        Rmat.mix64(seed ^ (i + 1L)), (maxScale - minScale + 1).toLong).toInt
      val gseed = Rmat.mix64(seed + i)
      spark.range((1L << scale) * edgeFactor).map { idx =>
        val (s, d) = Rmat.edge(gseed, idx, scale)
        (i, s, d)
      }.toDF("graph_id", "src", "dst")
    }.reduce(_ union _)
  }
}
