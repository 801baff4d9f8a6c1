package graft.core

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph.ID

/**
 * N-partite / bipartite partition bookkeeping over a [[LinkGraph]] —
 * the reference's `NPartiteGraph` / `BiPartiteGraph` surface
 * (`/root/reference/python/cugraph/cugraph/structure/graph_classes.py:704-886`,
 * impl `graph_implementation/npartiteGraph.py:40-101`).
 *
 * Like the reference, the partition assignment is USER-ASSERTED state:
 * `addNodesFrom` records which vertices the caller placed in which
 * named partition; nothing here re-derives 2-colorability (that is
 * [[graft.algos.Bipartite]], which COMPUTES what the reference's
 * `is_bipartite` stubs). `sets` returns the declared partitions; for a
 * bipartite graph with only one declared side the other side is the
 * complement — computed distributively as an anti-join against the
 * graph's vertex set (the reference does a host-side Python set
 * difference, `npartiteGraph.py:55-58`; at 10^10 vertices only the
 * anti-join shape survives).
 *
 * Partition frames are single-column (`id`) DataFrames; insertion
 * order is preserved (the reference keys an ordered dict).
 */
final class NPartiteGraph private (
    val graph: LinkGraph,
    val bipartite: Boolean) {

  private var parts: ListMap[String, DataFrame] = ListMap.empty
  private var allNodes: Option[DataFrame] = None

  /** Reference `NPartiteGraph.is_multipartite` (graph_classes.py:863) —
   * constructor-asserted, always true for this class. */
  def isMultipartite: Boolean = true

  /** Reference `BiPartiteGraph.is_bipartite` (graph_classes.py:879) —
   * constructor-asserted, NOT computed (see [[graft.algos.Bipartite]]
   * for the computed test). */
  def isBipartite: Boolean = bipartite

  /** Declared partition names, in insertion order. */
  def partitionNames: Seq[String] = parts.keys.toSeq

  /**
   * Record a node set (reference `add_nodes_from`,
   * graph_classes.py:834-869). Exactly the reference's guards:
   * naming a `multipartite` set on a bipartite graph, or a
   * `bipartite` set on a plain n-partite graph, is an error; a
   * bipartite graph accepts at most two distinct side names; with
   * neither name the set is stored as the graph's full node list.
   */
  def addNodesFrom(
      nodes: DataFrame,
      bipartite: Option[String] = None,
      multipartite: Option[String] = None): Unit = {
    val ns = nodes.select(nodes.columns.head).toDF(ID)
    (bipartite, multipartite) match {
      case (None, None) =>
        allNodes = Some(ns)
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException(
          "pass bipartite or multipartite, not both")
      case (None, Some(name)) =>
        if (this.bipartite)
          throw new IllegalArgumentException(
            "The Graph is bipartite. Use bipartite option instead.")
        parts += (name -> ns)
      case (Some(name), None) =>
        if (!this.bipartite)
          throw new IllegalArgumentException(
            "The Graph is set as npartite. Use multipartite option instead.")
        if (!parts.contains(name) && parts.size == 2)
          throw new IllegalArgumentException(
            "The Graph is set as bipartite and already has two partitions " +
              "initialized.")
        parts += (name -> ns)
    }
  }

  /** The graph's node list: the user-asserted `all_nodes` set if one
   * was recorded, otherwise the vertices appearing in edges (the
   * reference's `nodes()` fallback, simpleGraph.py). */
  def nodes: DataFrame = allNodes.getOrElse(graph.vertices)

  /**
   * The two sides of a bipartite graph (reference `sets()`,
   * npartiteGraph.py:40-60): the first declared side, and either the
   * second declared side or the complement of the first within
   * [[nodes]] — here a distributed anti-join, not a host set
   * difference.
   */
  def bipartiteSets: (DataFrame, DataFrame) = {
    require(bipartite, "graph was not constructed as bipartite")
    require(parts.nonEmpty,
      "no bipartite set declared via addNodesFrom (reference raises here " +
        "too: sets() does not parse the graph)")
    val top = parts.head._2
    val bottom =
      if (parts.size == 2) parts.last._2
      else nodes.join(top, Seq(ID), "left_anti")
    (top, bottom)
  }

  /** All declared partitions of a multipartite graph (reference
   * `sets()` else-branch, npartiteGraph.py:60). */
  def partiteSets: Map[String, DataFrame] = {
    require(!bipartite, "bipartite graph: use bipartiteSets")
    parts
  }
}

object NPartiteGraph {
  /** Reference `NPartiteGraph(bipartite=False)` (graph_classes.py:705). */
  def apply(graph: LinkGraph, bipartite: Boolean = false): NPartiteGraph =
    new NPartiteGraph(graph, bipartite)

  /** Reference `BiPartiteGraph()` (graph_classes.py:872). */
  def biPartite(graph: LinkGraph): NPartiteGraph =
    new NPartiteGraph(graph, bipartite = true)
}
