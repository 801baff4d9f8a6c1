package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PropertyGraph
import graft.core.PropertyGraph.{DST, EDGE_ID, SRC, TYPE, VERTEX}

/**
 * Driver queries for the heterogeneous [[PropertyGraph]] (reference
 * `property_graph.py:56`): a two-vertex-type (part, supplier) /
 * one-edge-type (supplies) graph over the TPC-H tables. Supplier ids
 * are offset by 10^7 so the two key spaces cannot collide — the
 * reference leaves id uniqueness to the caller the same way.
 */
object PropertyQueries {

  private val SuppOffset = 10000000L

  /** part/supplier vertices + lineitem supplies edges. */
  def build(s: SparkSession, dir: String): PropertyGraph = {
    val part = s.read.parquet(s"$dir/part.parquet")
    val supp = s.read.parquet(s"$dir/supplier.parquet")
      .withColumn("sid", col("s_suppkey") + SuppOffset)
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("sid", col("l_suppkey") + SuppOffset)
    PropertyGraph.empty
      .addVertexData(part, "p_partkey", "part",
        Some(Seq("p_size", "p_retailprice")))
      .addVertexData(supp, "sid", "supplier",
        Some(Seq("s_acctbal", "s_nationkey")))
      .addEdgeData(li, "sid", "l_partkey", "supplies",
        Some(Seq("l_quantity", "l_extendedprice")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Introspection surface: type lists, per-type counts,
    // include-edge-data vertex count, property-name counts, the
    // multigraph check (get_num_* / has_duplicate_edges).
    "q_pg_stats" -> ((s, dir) => {
      val pg = build(s, dir)
      import s.implicits._
      Seq(
        ("vertices", "part", pg.getNumVertices(Some("part"))),
        ("vertices", "supplier", pg.getNumVertices(Some("supplier"))),
        ("vertices_incl_edge_data", "all", pg.getNumVertices(None)),
        ("edges", "supplies", pg.getNumEdges(Some("supplies"))),
        ("vertex_props", "n", pg.vertexPropertyNames.size.toLong),
        ("edge_props", "n", pg.edgePropertyNames.size.toLong),
        ("vertex_types", "n", pg.vertexTypes.size.toLong),
        ("edge_types", "n", pg.edgeTypes.size.toLong),
        ("has_dup_edges", "supplies",
          if (pg.hasDuplicateEdges) 1L else 0L)
      ).toDF("kind", "name", "n")
    }),

    // extract_subgraph: big parts (p_size >= 25), solvent suppliers
    // (s_acctbal >= 0), heavy shipments (l_quantity >= 30), weighted
    // by extended price. Edge ids prove the deterministic DenseRank
    // assignment end-to-end.
    "q_pg_subgraph" -> ((s, dir) => {
      val pg = build(s, dir)
      pg.extractSubgraph(
          vertexSelection = Some(
            (col(TYPE) === "part" && col("p_size") >= 25) ||
              (col(TYPE) === "supplier" && col("s_acctbal") >= 0)),
          edgeSelection = Some(col("l_quantity") >= 30),
          edgeWeightProperty = Some("l_extendedprice"))
        .select(col(EDGE_ID).as("eid"), col(SRC).as("src"),
          col(DST).as("dst"),
          round(col("weight") * 1e6, 0).cast("long").as("w_micro"))
    }),

    // renumber_vertices_by_type: dense ids contiguous per type.
    "q_pg_renumber" -> ((s, dir) =>
      build(s, dir).renumberVerticesByType()
        .select(col(VERTEX).as("vertex"), col(TYPE).as("vtype"),
          col("new_id"))),

    // GNN GraphStore feature fetch (graph_store.py:70,402): node
    // features for an id set through the store facade — a key join
    // with nulls for ids outside the type (the -1 probe row).
    "q_store_fetch" -> ((s, dir) => {
      val store = graft.gnn.GraphStore(build(s, dir))
      import s.implicits._
      val ids = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").cast("long").as("vertex"))
        .orderBy("vertex").limit(20)
        .union(Seq(-1L).toDF("vertex"))
      store.getNodeStorage(ids, Seq("p_size", "p_retailprice"),
          Some("part"))
        .select(col(VERTEX).as("vertex"), col(TYPE).as("vtype"),
          col("p_size"),
          round(col("p_retailprice") * 1e6, 0).cast("long")
            .as("price_micro"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pg_stats" ->
      """SELECT 'vertices' AS kind, 'part' AS name,
        |       (SELECT count(DISTINCT p_partkey) FROM part) AS n
        |UNION ALL SELECT 'vertices', 'supplier',
        |       (SELECT count(DISTINCT s_suppkey) FROM supplier)
        |UNION ALL SELECT 'vertices_incl_edge_data', 'all',
        |       (SELECT count(*) FROM (
        |          SELECT p_partkey AS v FROM part
        |          UNION SELECT s_suppkey + 10000000 FROM supplier
        |          UNION SELECT l_suppkey + 10000000 FROM lineitem
        |          UNION SELECT l_partkey FROM lineitem) t)
        |UNION ALL SELECT 'edges', 'supplies',
        |       (SELECT count(*) FROM lineitem)
        |UNION ALL SELECT 'vertex_props', 'n', 4
        |UNION ALL SELECT 'edge_props', 'n', 2
        |UNION ALL SELECT 'vertex_types', 'n', 2
        |UNION ALL SELECT 'edge_types', 'n', 1
        |UNION ALL SELECT 'has_dup_edges', 'supplies',
        |       (SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END FROM (
        |          SELECT 1 FROM lineitem
        |          GROUP BY l_suppkey, l_partkey HAVING count(*) > 1) d)""".stripMargin,

    "q_pg_subgraph" ->
      """WITH e AS (
        |  SELECT l_suppkey + 10000000 AS src, l_partkey AS dst,
        |    l_quantity, l_extendedprice,
        |    row_number() OVER (
        |      ORDER BY l_suppkey + 10000000, l_partkey, l_quantity,
        |               l_extendedprice) - 1 AS eid
        |  FROM lineitem
        |)
        |SELECT e.eid, e.src, e.dst,
        |  CAST(round(e.l_extendedprice * 1e6) AS BIGINT) AS w_micro
        |FROM e
        |JOIN part p ON p.p_partkey = e.dst AND p.p_size >= 25
        |JOIN supplier s ON s.s_suppkey + 10000000 = e.src
        |  AND s.s_acctbal >= 0
        |WHERE e.l_quantity >= 30""".stripMargin,

    "q_pg_renumber" ->
      """WITH v AS (
        |  SELECT p_partkey AS vertex, 'part' AS vtype FROM part
        |  UNION ALL
        |  SELECT s_suppkey + 10000000, 'supplier' FROM supplier
        |)
        |SELECT vertex, vtype,
        |  row_number() OVER (ORDER BY vtype, vertex) - 1 AS new_id
        |FROM v""".stripMargin,

    "q_store_fetch" ->
      """WITH ids AS (
        |  SELECT vertex FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS vertex FROM part
        |    ORDER BY p_partkey LIMIT 20) t
        |  UNION ALL SELECT CAST(-1 AS BIGINT)
        |)
        |SELECT i.vertex,
        |  CASE WHEN p.p_partkey IS NULL THEN NULL ELSE 'part' END AS vtype,
        |  p.p_size AS p_size,
        |  CAST(round(p.p_retailprice * 1e6, 0) AS BIGINT) AS price_micro
        |FROM ids i LEFT JOIN part p ON p.p_partkey = i.vertex""".stripMargin
  )
}
