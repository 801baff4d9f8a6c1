package graft

import org.apache.spark.sql.functions._

import graft.algos.ConnectedComponents
import graft.core.PropertyGraph
import graft.core.PropertyGraph.{DST, EDGE_ID, SRC, TYPE, VERTEX}

/** PropertyGraph semantics vs the reference contract
 * (`property_graph.py:56`): typed add/introspect, selection-based
 * subgraph extraction, multigraph handling, per-type renumbering,
 * annotate-back, and algorithm integration. */
class PropertyGraphSpec extends SparkSpec {

  private def pg = {
    import spark.implicits._
    val people = Seq((1L, "ann", 34), (2L, "bob", 51), (3L, "cyd", 19))
      .toDF("pid", "pname", "age")
    val sites = Seq((10L, "a.com"), (11L, "b.org")).toDF("sid", "host")
    val visits = Seq((1L, 10L, 3.0), (1L, 10L, 3.0), (2L, 11L, 1.0),
      (3L, 10L, 2.0)).toDF("p", "s", "dur")
    val follows = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    PropertyGraph.empty
      .addVertexData(people, "pid", "person")
      .addVertexData(sites, "sid", "site", Some(Seq("host")))
      .addEdgeData(visits, "p", "s", "visits", Some(Seq("dur")))
      .addEdgeData(follows, "a", "b", "follows")
  }

  test("introspection: types, property names, typed counts") {
    val g = pg
    assert(g.vertexTypes == Seq("person", "site"))
    assert(g.edgeTypes == Seq("follows", "visits"))
    assert(g.vertexPropertyNames.toSet == Set("pname", "age", "host"))
    assert(g.edgePropertyNames == Seq("dur"))
    assert(g.getNumVertices(Some("person")) == 3L)
    assert(g.getNumVertices(Some("site")) == 2L)
    assert(g.getNumVertices(None) == 5L)
    assert(g.getNumEdges(None) == 6L)
    assert(g.getNumEdges(Some("visits")) == 4L)
  }

  test("vertices only present in edges count when includeEdgeData") {
    import spark.implicits._
    val g = PropertyGraph.empty
      .addVertexData(Seq((1L, "x")).toDF("v", "p"), "v", "t")
      .addEdgeData(Seq((1L, 99L)).toDF("a", "b"), "a", "b", "e")
    assert(g.getNumVertices(None, includeEdgeData = true) == 2L)
    assert(g.getNumVertices(None, includeEdgeData = false) == 1L)
  }

  test("wide frame: columns of other types are null, typed get filters") {
    val g = pg
    val persons = g.getVertexData(types = Some(Seq("person")))
    assert(persons.count() == 3)
    assert(persons.filter(col("host").isNotNull).count() == 0)
    val sites = g.getVertexData(types = Some(Seq("site")),
      columns = Some(Seq("host")))
    assert(sites.columns.toSeq == Seq(VERTEX, TYPE, "host"))
    val visits = g.getEdgeData(types = Some(Seq("visits")))
    assert(visits.filter(col("dur").isNull).count() == 0)
  }

  test("edge ids: dense, deterministic, offset across additions") {
    val g = pg
    val ids = g.getEdgeData().select(EDGE_ID).collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to 5L)) // 4 visits then 2 follows
    val follows = g.getEdgeData(types = Some(Seq("follows")))
      .select(EDGE_ID, SRC).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // second addition starts at 4; sorted by (src, dst) => 1->2 first
    assert(follows.toSeq == Seq((4L, 1L), (5L, 2L)))
    // rebuild: identical assignment
    val again = pg.getEdgeData().select(EDGE_ID, SRC, DST).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = g.getEdgeData().select(EDGE_ID, SRC, DST).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == first)
  }

  test("extractSubgraph: edge predicate, both endpoints must pass") {
    val g = pg
    // persons 34+ and all sites; visits only
    val sub = g.extractSubgraph(
      vertexSelection = Some(
        (col(TYPE) === "person" && col("age") >= 34) ||
          col(TYPE) === "site"),
      edgeSelection = Some(col(TYPE) === "visits"),
      edgeWeightProperty = Some("dur"))
    val got = sub.select(SRC, DST, "weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cyd (19) filtered => her visit drops; ann's duplicate visit kept twice
    assert(got.sorted.toSeq == Seq((1L, 10L, 3.0), (1L, 10L, 3.0),
      (2L, 11L, 1.0)))
  }

  test("default weight when no weight property; multigraph detection") {
    val g = pg
    val sub = g.extractSubgraph(defaultEdgeWeight = 2.5)
    assert(sub.select("weight").distinct().collect()
      .map(_.getDouble(0)).toSeq == Seq(2.5))
    assert(g.hasDuplicateEdges)
    intercept[IllegalArgumentException] {
      g.extractSubgraph(checkMultiEdges = true)
    }
  }

  test("toLinkGraph sums parallel edges; algorithms run on the result") {
    val g = pg
    val sub = g.extractSubgraph(
      edgeSelection = Some(col(TYPE) === "visits"),
      edgeWeightProperty = Some("dur"))
    val lg = PropertyGraph.toLinkGraph(sub)
    val w = lg.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w == Map((1L, 10L) -> 6.0, (2L, 11L) -> 1.0, (3L, 10L) -> 2.0))
    // WCC over the symmetrized visit graph: {1,3,10} and {2,11}
    val sym = lg.copy(edges = lg.edges.union(
      lg.edges.select(col("dst").as("src"), col("src").as("dst"),
        col("weight"))), directed = false)
    val comps = ConnectedComponents.run(sym).components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == comps(10L) && comps(1L) == comps(3L))
    assert(comps(2L) == comps(11L) && comps(1L) != comps(2L))
  }

  test("annotateDataframe joins edge properties onto algorithm output") {
    import spark.implicits._
    val g = pg
    val algoOut = Seq((1L, 10L, 0.7), (2L, 11L, 0.3))
      .toDF("src", "dst", "score")
    val ann = g.annotateDataframe(algoOut)
    // ann's duplicate visit gives two annotated rows for (1,10)
    assert(ann.filter(col("score") === 0.7).count() == 2)
    assert(ann.filter(col("score") === 0.3)
      .select("dur").head().getDouble(0) == 1.0)
  }

  test("renumberVerticesByType: dense contiguous ranges per type") {
    val g = pg
    val rows = g.renumberVerticesByType().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (0L to 4L))
    val byType = rows.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    assert(byType("person").toSeq == Seq(0L, 1L, 2L)) // person < site
    assert(byType("site").toSeq == Seq(3L, 4L))
    // within type: ordered by external id
    assert(rows.filter(_._2 == "site").sortBy(_._3).map(_._1).toSeq ==
      Seq(10L, 11L))
  }

  test("renumberEdgesByType: contiguous per type, follows before visits") {
    val g = pg
    val rows = g.renumberEdgesByType().collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byType("follows").toSeq == Seq(0L, 1L))
    assert(byType("visits").toSeq == Seq(2L, 3L, 4L, 5L))
  }
}
