package graft.gnn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algos.NeighborSampling
import graft.core.{LinkGraph, PropertyGraph}
import graft.core.PropertyGraph.{DST, EDGE_ID, SRC, TYPE, VERTEX}

/**
 * GNN graph store — the reference's CuGraphStore
 * (`/root/reference/python/cugraph/cugraph/gnn/graph_store.py:30`): a
 * typed feature/sampling facade over [[PropertyGraph]] for mini-batch
 * training pipelines. The reference returns dlpack capsules for
 * torch/DGL; the Spark analog returns DataFrames — the tensor handoff
 * is the pipeline boundary (arrow batches), not graph logic, so it
 * lives with the consumer.
 *
 * Everything here composes operators that already carry their own
 * scale arguments: feature fetches are key joins against the wide
 * property frames, per-type subgraphs are Catalyst-pushed filters
 * (`graph_store.py:276-318` extracted_subgraph[s_per_type]), and
 * `sampleNeighbors` delegates to the BoundedMinK uniform sampler
 * (`graph_store.py:155` sample_neighbors → uniform_neighbor_sample).
 */
final case class GraphStore(pg: PropertyGraph = PropertyGraph.empty) {

  /** add_node_data (`graph_store.py:54`). */
  def addNodeData(
      df: DataFrame,
      nodeCol: String,
      ntype: String,
      featColumns: Option[Seq[String]] = None): GraphStore =
    copy(pg = pg.addVertexData(df, nodeCol, ntype, featColumns))

  /** add_edge_data (`graph_store.py:61`). */
  def addEdgeData(
      df: DataFrame,
      srcCol: String,
      dstCol: String,
      etype: String,
      featColumns: Option[Seq[String]] = None): GraphStore =
    copy(pg = pg.addEdgeData(df, srcCol, dstCol, etype, featColumns))

  def ntypes: Seq[String] = pg.vertexTypes
  def etypes: Seq[String] = pg.edgeTypes
  def hasMultipleEtypes: Boolean = etypes.size > 1
  def numNodes(ntype: Option[String] = None): Long = pg.getNumVertices(ntype)
  def numEdges(etype: Option[String] = None): Long = pg.getNumEdges(etype)

  /** get_node_storage.fetch (`graph_store.py:70,402`): features for a
   * set of node ids — a key join, nulls for ids outside the type. */
  def getNodeStorage(
      ids: DataFrame,
      featNames: Seq[String],
      ntype: Option[String] = None): DataFrame = {
    val data = pg.getVertexData(ntype.map(Seq(_)), Some(featNames))
    ids.select(col(ids.columns.head).as(VERTEX))
      .join(data, Seq(VERTEX), "left")
  }

  /** get_edge_storage.fetch (`graph_store.py:98`): features for a set
   * of edge ids. */
  def getEdgeStorage(
      edgeIds: DataFrame,
      featNames: Seq[String],
      etype: Option[String] = None): DataFrame = {
    val data = pg.getEdgeData(etype.map(Seq(_)), Some(featNames))
    edgeIds.select(col(edgeIds.columns.head).as(EDGE_ID))
      .join(data, Seq(EDGE_ID), "left")
  }

  /** find_edges (`graph_store.py:346`): (src, dst) endpoints of the
   * given edge ids within a type. */
  def findEdges(edgeIds: DataFrame, etype: String): DataFrame =
    edgeIds.select(col(edgeIds.columns.head).as(EDGE_ID))
      .join(pg.getEdgeData(Some(Seq(etype))), Seq(EDGE_ID))
      .select(col(EDGE_ID), col(SRC).as(LinkGraph.SRC),
        col(DST).as(LinkGraph.DST))

  /** extracted_subgraph[_per_type] (`graph_store.py:276-318`): one
   * LinkGraph per edge type (or the whole store), reversed for
   * pull-side sampling when asked. */
  def extractedSubgraph(
      etype: Option[String] = None,
      reverse: Boolean = false): LinkGraph = {
    val sub = pg.extractSubgraph(
      edgeSelection = etype.map(t => col(TYPE) === t))
    val flipped =
      if (reverse)
        sub.withColumnRenamed(SRC, "__t").withColumnRenamed(DST, SRC)
          .withColumnRenamed("__t", DST)
      else sub
    PropertyGraph.toLinkGraph(flipped, combine = "min")
  }

  /**
   * sample_neighbors (`graph_store.py:155`): per-edge-type uniform
   * fanout sampling from a seed set. edgeDir "in" samples the reverse
   * graph (DGL's default message direction), "out" the forward one.
   * Returns (etype, hop, src, dst) sampled edges.
   */
  def sampleNeighbors(
      seeds: DataFrame,
      fanout: Int,
      edgeDir: String = "in",
      etype: Option[String] = None,
      seed: Long = 42L): DataFrame = {
    require(edgeDir == "in" || edgeDir == "out",
      s"edge_dir must be in|out, got $edgeDir")
    val types = etype.map(Seq(_)).getOrElse(etypes)
    types.map { t =>
      val g = extractedSubgraph(Some(t), reverse = edgeDir == "in")
      NeighborSampling.run(g, seeds, Seq(fanout), seed)
        .withColumn("etype", lit(t))
        .select("etype", "hop", "src", "dst")
    }.reduce(_ unionByName _)
  }
}
