package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{LinkGraph, Renumber}

/**
 * pages table → renumbered link graph, the ingest pipeline of SURVEY.md
 * §3.3: extract anchors (pinned extractor) → degree-descending renumber
 * → dense-id edge table. Duplicate anchors become parallel edges
 * (weight 1 each), matching the reference's default of feeding the raw
 * COO to the algorithms; symmetrize/dedupe are explicit graph ops.
 */
object WebGraph {

  final case class Built(urlMap: DataFrame, graph: LinkGraph)

  def fromPages(pages: DataFrame, numPartitions: Int): Built = {
    val edgeUrls = LinkExtractor.pagesToEdges(pages)
    val urlMap = Renumber.buildMap(edgeUrls, numPartitions)
    val edges = Renumber.encode(edgeUrls, urlMap)
    Built(urlMap, LinkGraph(edges, directed = true, numPartitions))
  }

  /** Attach urls back onto a per-vertex result (unrenumber join). */
  def withUrls(result: DataFrame, urlMap: DataFrame): DataFrame =
    Renumber.decode(result, urlMap)
}
