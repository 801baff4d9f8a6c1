package graft

import org.apache.spark.sql.functions._

import graft.gnn.GraphStore

/** CuGraphStore facade semantics (`gnn/graph_store.py:30`): typed
 * feature storage, per-type subgraphs, direction-aware uniform
 * neighbor sampling. */
class GraphStoreSpec extends SparkSpec {

  private def store = {
    import spark.implicits._
    val users = Seq((1L, 0.5, 10), (2L, 0.9, 20), (3L, 0.1, 30))
      .toDF("uid", "feat_a", "feat_b")
    val items = Seq((100L, 7.0), (101L, 8.0)).toDF("iid", "price")
    val clicks = Seq((1L, 100L, 2.0), (1L, 101L, 3.0), (2L, 100L, 1.0))
      .toDF("u", "i", "cnt")
    val follows = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    GraphStore()
      .addNodeData(users, "uid", "user")
      .addNodeData(items, "iid", "item")
      .addEdgeData(clicks, "u", "i", "clicks", Some(Seq("cnt")))
      .addEdgeData(follows, "a", "b", "follows")
  }

  test("type lists and counts") {
    val s = store
    assert(s.ntypes == Seq("item", "user"))
    assert(s.etypes == Seq("clicks", "follows"))
    assert(s.hasMultipleEtypes)
    assert(s.numNodes(Some("user")) == 3L)
    assert(s.numEdges(Some("clicks")) == 3L)
    assert(s.numEdges(None) == 6L)
  }

  test("node/edge feature storage fetch by id") {
    import spark.implicits._
    val s = store
    val feats = s.getNodeStorage(Seq(1L, 3L, 999L).toDF("id"),
      Seq("feat_a"), Some("user")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(feats == Map(1L -> Some(0.5), 3L -> Some(0.1), 999L -> None))
    // edge ids: clicks added first, sorted by (src, dst, cnt) => (1,100)=0
    val ef = s.getEdgeStorage(Seq(0L).toDF("eid"), Seq("cnt"),
      Some("clicks")).collect()
    assert(ef.length == 1 && ef.head.getDouble(4) == 2.0)
  }

  test("findEdges returns endpoints of edge ids within a type") {
    import spark.implicits._
    val s = store
    val got = s.findEdges(Seq(0L, 2L).toDF("eid"), "clicks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 100L), (2L, 2L, 100L)))
  }

  test("per-type subgraph, forward and reversed") {
    val s = store
    val fwd = s.extractedSubgraph(Some("clicks")).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fwd == Set((1L, 100L), (1L, 101L), (2L, 100L)))
    val rev = s.extractedSubgraph(Some("clicks"), reverse = true)
      .edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rev == Set((100L, 1L), (101L, 1L), (100L, 2L)))
  }

  test("sampleNeighbors: fanout bound, right direction, deterministic") {
    import spark.implicits._
    val s = store
    val seeds = Seq(100L, 101L).toDF("id")
    // edgeDir=in on clicks: who clicked these items
    val in1 = s.sampleNeighbors(seeds, fanout = 1, edgeDir = "in",
      etype = Some("clicks")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(in1.forall(_._1 == "clicks"))
    // fanout 1: one sampled in-neighbor per seed
    assert(in1.groupBy(_._2).forall(_._2.length == 1))
    assert(in1.forall { case (_, item, user) =>
      Set((user, item)).subsetOf(Set((1L, 100L), (1L, 101L), (2L, 100L))) })
    val in2 = s.sampleNeighbors(seeds, fanout = 1, edgeDir = "in",
      etype = Some("clicks")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(in1.sorted.toSeq == in2.sorted.toSeq)
    // all etypes: follows seeds have out-edges in the follow cycle
    val all = s.sampleNeighbors(Seq(1L).toDF("id"), fanout = 5,
      edgeDir = "out").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(all == Set(("clicks", 1L, 100L), ("clicks", 1L, 101L),
      ("follows", 1L, 2L)))
  }
}
