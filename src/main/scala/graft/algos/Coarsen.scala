package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * Graph coarsening: contract vertices by a label column and sum
 * parallel edge weights — the reference's `coarsen_graph`
 * (`/root/reference/cpp/src/structure/coarsen_graph_impl.cuh`, used by
 * Louvain's dendrogram levels and WCC's level compression).
 * Shape: two label joins + one groupBy-sum, all map-side combinable.
 */
object Coarsen {

  /** labels: (id, label). Returns the contracted LinkGraph whose
   * vertices are labels; self-edges inside a cluster are kept
   * (weight-summed), matching the reference default. */
  def run(g: LinkGraph, labels: DataFrame): LinkGraph = {
    val lSrc = labels.select(col(ID).as(SRC), col("label").as("ls"))
    val lDst = labels.select(col(ID).as(DST), col("label").as("ld"))
    val e = g.edges
      .join(lSrc, Seq(SRC))
      .join(lDst, Seq(DST))
      .groupBy(col("ls").as(SRC), col("ld").as(DST))
      .agg(sum(WEIGHT).as(WEIGHT))
    LinkGraph(e, g.directed, g.numPartitions)
  }
}
