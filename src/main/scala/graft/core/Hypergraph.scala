package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hypergraph transform (reference
 * `/root/reference/python/cugraph/cugraph/structure/hypergraph.py:42`):
 * lift a tabular frame into a graph that reveals relationships between
 * rows and the unique values they share.
 *
 *  - INDIRECT (default): every row becomes an event node, every
 *    distinct (column, value) a attribute node, and each row links its
 *    event node to each of its attribute nodes (edge_type = column) —
 *    rows sharing metadata become transitively connected through the
 *    shared attribute node.
 *  - DIRECT: the event hypernode is omitted; a row's attribute nodes
 *    connect pairwise in column order (edge_type = "colA::colB").
 *
 * Node ids are `column<delim>value` strings (the reference's DELIM
 * scheme); feed them through [[Renumber]] when a LinkGraph is needed.
 *
 * Spark shape: the melt is a projection + explode (partition-local,
 * no shuffle); `nodes` dedupes on the node id (one hash shuffle);
 * edges in direct mode dedupe per (src, dst) with a row count. All of
 * it map-side combinable — the transform scales with the input rows.
 */
object Hypergraph {

  final case class Result(nodes: DataFrame, edges: DataFrame)

  /**
   * @param df       input rows
   * @param columns  attribute columns to lift (order matters in
   *                 direct mode)
   * @param eventId  unique row id column (the reference's EVENTID)
   * @param direct   pairwise attribute edges instead of event links
   * @param dropNa   skip null attribute values (reference dropna)
   * @param delim    node id separator (reference DELIM "::")
   */
  def transform(
      df: DataFrame,
      columns: Seq[String],
      eventId: String,
      direct: Boolean = false,
      dropNa: Boolean = true,
      delim: String = "::"): Result = {
    require(columns.nonEmpty, "need at least one attribute column")

    // Null-safe: with dropNa=false a null attribute still gets a node
    // (the reference's NaN fill), spelled `col::null`.
    def nodeId(colName: String, c: org.apache.spark.sql.Column) =
      concat(lit(colName), lit(delim), coalesce(c.cast("string"), lit("null")))

    val attribCols = columns.map { name =>
      val v = col(name)
      struct(lit(name).as("node_type"), nodeId(name, v).as("node_id"),
        v.isNull.as("isna"))
    }
    val melted = df
      .select(nodeId(eventId, col(eventId)).as("event_node"),
        explode(array(attribCols: _*)).as("a"))
      .select(col("event_node"), col("a.node_type"), col("a.node_id"),
        col("a.isna"))
    val kept = if (dropNa) melted.filter(!col("isna")) else melted

    val attribNodes = kept.select(col("node_id"), col("node_type")).distinct()
    val edges =
      if (!direct) {
        val eventNodes = df
          .select(nodeId(eventId, col(eventId)).as("node_id"),
            lit(eventId).as("node_type"))
          .distinct()
        Result(
          attribNodes.unionByName(eventNodes),
          kept.select(col("event_node").as("src"), col("node_id").as("dst"),
            col("node_type").as("edge_type")))
      } else {
        // Pairwise in column order, deduped with a row count (the
        // reference emits one multigraph edge per row; the count keeps
        // that information in a deterministic, hash-comparable shape).
        val pairs = for {
          i <- columns.indices; j <- columns.indices if i < j
        } yield (columns(i), columns(j))
        val pairEdges = pairs.map { case (a, b) =>
          val base = df.select(
            nodeId(a, col(a)).as("src"), nodeId(b, col(b)).as("dst"))
          val f = if (dropNa) df.select(col(a), col(b))
            .filter(col(a).isNotNull && col(b).isNotNull)
            .select(nodeId(a, col(a)).as("src"), nodeId(b, col(b)).as("dst"))
          else base
          f.withColumn("edge_type", lit(s"$a$delim$b"))
        }.reduce(_ unionByName _)
        Result(
          attribNodes,
          pairEdges.groupBy("src", "dst", "edge_type")
            .agg(count(lit(1)).as("n_rows")))
      }
    edges
  }
}
