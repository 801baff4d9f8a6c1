package graft

import org.apache.spark.sql.Row

import graft.core.Hypergraph

/** Hypergraph lift semantics vs the reference's hypergraph.py contract
 * (`hypergraph.py:42`): indirect event↔attribute bipartite edges,
 * direct pairwise attribute edges, null handling. */
class HypergraphSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some(10L), Some("click")),
      (2L, Some(10L), Some("view")),
      (3L, Some(20L), Some("click")),
      (4L, None: Option[Long], Some("view")),
      (5L, Some(20L), None: Option[String])
    ).toDF("event_id", "user_id", "event_type")
  }

  test("indirect: one edge per non-null (row, column); nodes = events + attrs") {
    val r = Hypergraph.transform(fixture, Seq("user_id", "event_type"), "event_id")
    val edges = r.edges.collect().map(x =>
      (x.getString(0), x.getString(1), x.getString(2))).toSet
    // 5 user_id rows - 1 null + 5 event_type rows - 1 null = 8 edges
    assert(edges.size == 8)
    assert(edges.contains(("event_id::1", "user_id::10", "user_id")))
    assert(edges.contains(("event_id::4", "event_type::view", "event_type")))
    assert(!edges.exists(_._2.endsWith("::null")))
    // nodes: 5 event + 2 user + 2 type
    val nodes = r.nodes.collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(nodes.size == 9)
    assert(nodes.contains(("user_id::20", "user_id")))
    assert(nodes.contains(("event_id::3", "event_id")))
  }

  test("indirect: rows sharing an attribute are two hops apart") {
    val r = Hypergraph.transform(fixture, Seq("user_id"), "event_id")
    val byAttr = r.edges.collect().groupBy(_.getString(1))
    // events 1 and 2 both hang off user_id::10
    assert(byAttr("user_id::10").map(_.getString(0)).toSet ==
      Set("event_id::1", "event_id::2"))
  }

  test("direct: pairwise column-order edges with row counts, no event nodes") {
    val r = Hypergraph.transform(fixture, Seq("user_id", "event_type"),
      "event_id", direct = true)
    val edges = r.edges.collect().map(x =>
      (x.getString(0), x.getString(1), x.getString(2), x.getLong(3))).toSet
    // rows with both non-null: (10,click) (10,view) (20,click)
    assert(edges == Set(
      ("user_id::10", "event_type::click", "user_id::event_type", 1L),
      ("user_id::10", "event_type::view", "user_id::event_type", 1L),
      ("user_id::20", "event_type::click", "user_id::event_type", 1L)))
    assert(!r.nodes.collect().exists(_.getString(1) == "event_id"))
  }

  test("direct: duplicate pairs aggregate into n_rows") {
    import spark.implicits._
    val df = Seq((1L, 7L, "a"), (2L, 7L, "a"), (3L, 7L, "b"))
      .toDF("event_id", "user_id", "event_type")
    val e = Hypergraph.transform(df, Seq("user_id", "event_type"),
      "event_id", direct = true).edges.collect()
      .map(x => (x.getString(1), x.getLong(3))).toMap
    assert(e == Map("event_type::a" -> 2L, "event_type::b" -> 1L))
  }

  test("dropNa=false keeps null-valued attribute edges (reference dropna=False)") {
    val r = Hypergraph.transform(fixture, Seq("user_id"), "event_id",
      dropNa = false)
    assert(r.edges.count() == 5)
    assert(r.edges.collect().exists(_.getString(1) == "user_id::null"))
  }
}
