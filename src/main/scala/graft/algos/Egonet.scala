package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * Per-seed ego networks (reference `extract_ego`,
 * `/root/reference/cpp/include/cugraph/algorithms.hpp:1305-1309`, impl
 * `cpp/src/community/egonet_impl.cuh`): for each seed, the subgraph
 * induced on vertices within `radius` hops. The reference returns one
 * packed edge list with per-seed offsets; the Spark-native shape is
 * the TAGGED frame (seed, src, dst) — same information, one row per
 * (seed, edge) membership.
 *
 * Physical shape: the (seed, v) reach frame expands one hop per
 * superstep through the cached edge table (only the reach frame
 * shuffles — `radius` is small by use-case); the final induced-edge
 * step is two co-keyed joins on (seed, endpoint). A seed's ego can
 * overlap another's — rows are per seed by design, matching the
 * reference's per-seed offset ranges.
 */
object Egonet {

  /** Returns (seed, src, dst). */
  def extract(g0: LinkGraph, seeds: DataFrame, radius: Int = 1): DataFrame = {
    require(radius >= 0, s"radius must be >= 0, got $radius")
    val edges = g0.edges.select(SRC, DST)

    var reach = Lineage.materialize(
      seeds.select(col(seeds.columns.head).as("seed"))
        .distinct()
        .select(col("seed"), col("seed").as("v")),
      eager = false)
    val scratch = scala.collection.mutable.ArrayBuffer(reach)

    for (_ <- 1 to radius) {
      val next = Lineage.materialize(
        reach.df
          .union(edges
            .join(reach.df.hint("shuffle_hash"),
              reach.df("v") === edges(SRC))
            .select(col("seed"), col(DST).as("v")))
          .distinct(),
        eager = false)
      scratch += next
      reach = next
    }

    val bySrc = reach.df.select(col("seed"), col("v").as(SRC))
    val byDst = reach.df.select(col("seed"), col("v").as(DST))
    val out = Lineage.materialize(
      edges.join(bySrc, Seq(SRC))
        .join(byDst, Seq("seed", DST))
        .select(col("seed"), col(SRC), col(DST)))
    scratch.foreach(_.release())
    out.df
  }
}
