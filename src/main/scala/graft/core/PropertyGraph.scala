package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Heterogeneous property graph — the reference's PropertyGraph
 * (`/root/reference/python/cugraph/cugraph/structure/property_graph.py:56`):
 * typed vertex and edge property tables merged into one wide frame per
 * side, with selection-based subgraph extraction feeding the algorithm
 * surface and `annotateDataframe` joining algorithm output back onto
 * edge properties.
 *
 * Spark shape: each `add*Data` call is a projection + `unionByName`
 * (allowMissingColumns) — no shuffle, columns absent from a type stay
 * null exactly like the reference's NaN-padded outer merge. Edge ids
 * are assigned densely and deterministically via [[DenseRank]] over the
 * full row content (the scale-safe analog of the reference's
 * RangeIndex), offset by the edges already present. Selections are
 * Spark `Column` predicates over the wide frame — the declarative
 * analog of the reference's eval-string `select_vertices/select_edges`
 * — so Catalyst pushes them into the scan. `extractSubgraph` is two
 * broadcast-or-hash semi-joins (src-in-selection, dst-in-selection)
 * plus the edge filter; nothing materializes per-type copies.
 *
 * Instances are immutable; every mutator returns a new graph.
 */
final case class PropertyGraph(
    vertexProps: Option[DataFrame] = None,
    edgeProps: Option[DataFrame] = None,
    numEdgesAdded: Long = 0L) {

  import PropertyGraph._

  /** Register a typed vertex frame (reference add_vertex_data,
   * `property_graph.py:328`). */
  def addVertexData(
      df: DataFrame,
      vertexCol: String,
      typeName: String,
      propertyColumns: Option[Seq[String]] = None): PropertyGraph = {
    require(df.columns.contains(vertexCol), s"$vertexCol not in frame")
    val props = propertyColumns.getOrElse(
      df.columns.filterNot(_ == vertexCol).toSeq)
    val bad = props.filterNot(df.columns.contains)
    require(bad.isEmpty, s"property columns not in frame: $bad")
    val typed = df.select(
      col(vertexCol).cast("long").as(VERTEX) +:
        lit(typeName).as(TYPE) +:
        props.map(col): _*)
    copy(vertexProps = Some(vertexProps
      .map(_.unionByName(typed, allowMissingColumns = true))
      .getOrElse(typed)))
  }

  /** Register a typed edge frame (reference add_edge_data,
   * `property_graph.py:525`); assigns dense deterministic edge ids. */
  def addEdgeData(
      df: DataFrame,
      srcCol: String,
      dstCol: String,
      typeName: String,
      propertyColumns: Option[Seq[String]] = None): PropertyGraph = {
    require(df.columns.contains(srcCol) && df.columns.contains(dstCol),
      s"$srcCol/$dstCol not both in frame")
    val props = propertyColumns.getOrElse(
      df.columns.filterNot(c => c == srcCol || c == dstCol).toSeq)
    val bad = props.filterNot(df.columns.contains)
    require(bad.isEmpty, s"property columns not in frame: $bad")
    val typed = df.select(
      col(srcCol).cast("long").as(SRC) +:
        col(dstCol).cast("long").as(DST) +:
        props.map(col): _*)
    val n = typed.count()
    // Total order over full row content: identical rows are
    // interchangeable, so the id multiset is deterministic across
    // runs and partitionings.
    val sortKey = col(SRC) +: col(DST) +: props.map(col)
    val withId = DenseRank.assign(typed, sortKey,
      df.sparkSession.sessionState.conf.numShufflePartitions,
      idCol = EDGE_ID)
      .withColumn(EDGE_ID, col(EDGE_ID) + lit(numEdgesAdded))
      .withColumn(TYPE, lit(typeName))
    copy(
      edgeProps = Some(edgeProps
        .map(_.unionByName(withId, allowMissingColumns = true))
        .getOrElse(withId)),
      numEdgesAdded = numEdgesAdded + n)
  }

  // --- Introspection (reference property lists / type lists /
  //     get_num_* — property_graph.py:157-306) ---

  def vertexPropertyNames: Seq[String] =
    vertexProps.map(_.columns.filterNot(internalV).toSeq).getOrElse(Nil)

  def edgePropertyNames: Seq[String] =
    edgeProps.map(_.columns.filterNot(internalE).toSeq).getOrElse(Nil)

  def vertexTypes: Seq[String] = vertexProps
    .map(_.select(TYPE).distinct().collect().map(_.getString(0)).toSeq.sorted)
    .getOrElse(Nil)

  def edgeTypes: Seq[String] = edgeProps
    .map(_.select(TYPE).distinct().collect().map(_.getString(0)).toSeq.sorted)
    .getOrElse(Nil)

  /** Distinct vertices of a type (or all). With includeEdgeData,
   * endpoints that only appear in edges count too (type=None only,
   * like the reference). */
  def getNumVertices(
      typeName: Option[String] = None,
      includeEdgeData: Boolean = true): Long = {
    val declared = vertexProps.map { vp =>
      typeName.map(t => vp.filter(col(TYPE) === t)).getOrElse(vp)
        .select(VERTEX)
    }
    val fromEdges =
      if (typeName.isEmpty && includeEdgeData)
        edgeProps.map(ep => ep.select(col(SRC).as(VERTEX))
          .union(ep.select(col(DST).as(VERTEX))))
      else None
    (declared ++ fromEdges).reduceOption(_ union _)
      .map(_.distinct().count()).getOrElse(0L)
  }

  def getNumEdges(typeName: Option[String] = None): Long =
    edgeProps.map(ep =>
      typeName.map(t => ep.filter(col(TYPE) === t)).getOrElse(ep).count())
      .getOrElse(0L)

  /** Wide vertex rows, optionally restricted to types / columns
   * (reference get_vertex_data, `property_graph.py:492`). */
  def getVertexData(
      types: Option[Seq[String]] = None,
      columns: Option[Seq[String]] = None): DataFrame = {
    val vp = vertexProps.getOrElse(
      sys.error("no vertex data has been added"))
    val filtered = types.map(t => vp.filter(col(TYPE).isin(t: _*)))
      .getOrElse(vp)
    columns.map(cs => filtered.select((Seq(VERTEX, TYPE) ++ cs).map(col): _*))
      .getOrElse(filtered)
  }

  /** Wide edge rows (reference get_edge_data, `property_graph.py:741`). */
  def getEdgeData(
      types: Option[Seq[String]] = None,
      columns: Option[Seq[String]] = None): DataFrame = {
    val ep = edgeProps.getOrElse(sys.error("no edge data has been added"))
    val filtered = types.map(t => ep.filter(col(TYPE).isin(t: _*)))
      .getOrElse(ep)
    columns.map(cs =>
      filtered.select((Seq(EDGE_ID, SRC, DST, TYPE) ++ cs).map(col): _*))
      .getOrElse(filtered)
  }

  /**
   * Selection-based subgraph (reference extract_subgraph,
   * `property_graph.py:872`): edges passing `edgeSelection` whose BOTH
   * endpoints pass `vertexSelection` (when given), weighted from an
   * edge property or a default. Returns the surviving wide edge rows
   * plus a `weight` column; feed through [[toLinkGraph]] for the
   * algorithm surface.
   */
  def extractSubgraph(
      vertexSelection: Option[Column] = None,
      edgeSelection: Option[Column] = None,
      edgeWeightProperty: Option[String] = None,
      defaultEdgeWeight: Double = 1.0,
      checkMultiEdges: Boolean = false): DataFrame = {
    val ep = edgeProps.getOrElse(sys.error("no edge data has been added"))
    val efiltered = edgeSelection.map(ep.filter).getOrElse(ep)
    val edges = vertexSelection match {
      case Some(sel) =>
        val keep = vertexProps
          .getOrElse(sys.error("vertex selection without vertex data"))
          .filter(sel).select(col(VERTEX)).distinct()
        efiltered
          .join(keep.withColumnRenamed(VERTEX, SRC), Seq(SRC), "left_semi")
          .join(keep.withColumnRenamed(VERTEX, DST), Seq(DST), "left_semi")
      case None => efiltered
    }
    val weighted = edges.withColumn("weight",
      edgeWeightProperty
        .map(p => coalesce(col(p).cast("double"), lit(defaultEdgeWeight)))
        .getOrElse(lit(defaultEdgeWeight)))
    if (checkMultiEdges) {
      val dupes = weighted.groupBy(SRC, DST).count()
        .filter(col("count") > 1).count()
      require(dupes == 0L,
        s"selection yields a multigraph ($dupes duplicate (src,dst) " +
          "pairs); pass checkMultiEdges=false or aggregate in toLinkGraph")
    }
    weighted
  }

  /** Join algorithm output keyed on (src, dst) back onto the edge
   * properties (reference annotate_dataframe,
   * `property_graph.py:994`). */
  def annotateDataframe(
      df: DataFrame,
      srcCol: String = LinkGraph.SRC,
      dstCol: String = LinkGraph.DST): DataFrame = {
    val ep = edgeProps.getOrElse(sys.error("no edge data has been added"))
    df.join(ep,
      df(srcCol) === ep(SRC) && df(dstCol) === ep(DST), "left")
      .drop(SRC, DST)
  }

  /** Contiguous per-type vertex renumbering (reference
   * renumber_vertices_by_type, `property_graph.py:1168`): new ids are
   * dense in (type, vertex) order, so each type owns one contiguous
   * range. Returns the mapping frame; ranges are recoverable with a
   * groupBy(type).agg(min, max). */
  def renumberVerticesByType(): DataFrame = {
    val vp = vertexProps.getOrElse(sys.error("no vertex data"))
    val verts = vp.select(col(VERTEX), col(TYPE)).distinct()
    DenseRank.assign(verts, Seq(col(TYPE), col(VERTEX)),
      verts.sparkSession.sessionState.conf.numShufflePartitions,
      idCol = "new_id")
  }

  /** Contiguous per-type edge renumbering (reference
   * renumber_edges_by_type, `property_graph.py:1233`). */
  def renumberEdgesByType(): DataFrame = {
    val ep = edgeProps.getOrElse(sys.error("no edge data"))
    DenseRank.assign(ep.select(col(EDGE_ID), col(TYPE)),
      Seq(col(TYPE), col(EDGE_ID)),
      ep.sparkSession.sessionState.conf.numShufflePartitions,
      idCol = "new_id")
  }

  /** True if any (src, dst) pair repeats (reference has_duplicate_edges,
   * `property_graph.py:1285`). */
  def hasDuplicateEdges: Boolean =
    edgeProps.exists(ep =>
      ep.groupBy(SRC, DST).count().filter(col("count") > 1).limit(1)
        .count() > 0)
}

object PropertyGraph {
  // Reference column names (property_graph.py:63-70) — public API.
  val VERTEX = "_VERTEX_"
  val TYPE = "_TYPE_"
  val SRC = "_SRC_"
  val DST = "_DST_"
  val EDGE_ID = "_EDGE_ID_"

  private def internalV(c: String) = c == VERTEX || c == TYPE
  private def internalE(c: String) =
    c == SRC || c == DST || c == EDGE_ID || c == TYPE

  def empty: PropertyGraph = PropertyGraph()

  /** Extracted-subgraph rows → [[LinkGraph]], summing parallel edge
   * weights (the MultiGraph→Graph collapse). */
  def toLinkGraph(
      subgraph: DataFrame,
      directed: Boolean = true,
      combine: String = "sum"): LinkGraph = {
    val agg = combine match {
      case "sum" => sum(col("weight"))
      case "min" => min(col("weight"))
      case "max" => max(col("weight"))
      case other => sys.error(s"unknown combine: $other")
    }
    val e = subgraph.groupBy(col(SRC).as(LinkGraph.SRC),
        col(DST).as(LinkGraph.DST))
      .agg(agg.cast("double").as(LinkGraph.WEIGHT))
    LinkGraph(e, directed = directed,
      subgraph.sparkSession.sessionState.conf.numShufflePartitions)
  }
}
