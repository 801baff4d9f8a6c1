package graft

import org.apache.spark.sql.functions._

import graft.core.{LinkGraph, NPartiteGraph}
import graft.core.LinkGraph.ID

class NPartiteGraphSpec extends SparkSpec {

  private def star: LinkGraph =
    graphOf((1L to 6L).map(i => (0L, i, 1.0)))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(ID).collect().map(_.getLong(0)).toSet

  test("bipartite: declared top + complement bottom") {
    val g = NPartiteGraph.biPartite(star)
    assert(g.isBipartite && g.isMultipartite)
    g.addNodesFrom(star.vertices.filter(col(ID) === 0L),
      bipartite = Some("hub"))
    val (top, bottom) = g.bipartiteSets
    assert(ids(top) == Set(0L))
    assert(ids(bottom) == (1L to 6L).toSet)
  }

  test("bipartite: two declared sides returned verbatim") {
    val s = spark
    import s.implicits._
    val g = NPartiteGraph.biPartite(star)
    g.addNodesFrom(Seq(0L, 99L).toDF(ID), bipartite = Some("a"))
    g.addNodesFrom(Seq(1L, 2L).toDF(ID), bipartite = Some("b"))
    val (top, bottom) = g.bipartiteSets
    assert(ids(top) == Set(0L, 99L)) // verbatim, even off-graph ids
    assert(ids(bottom) == Set(1L, 2L))
  }

  test("bipartite: third side name rejected, re-declare allowed") {
    val s = spark
    import s.implicits._
    val g = NPartiteGraph.biPartite(star)
    g.addNodesFrom(Seq(0L).toDF(ID), bipartite = Some("a"))
    g.addNodesFrom(Seq(1L).toDF(ID), bipartite = Some("b"))
    intercept[IllegalArgumentException] {
      g.addNodesFrom(Seq(2L).toDF(ID), bipartite = Some("c"))
    }
    g.addNodesFrom(Seq(3L).toDF(ID), bipartite = Some("b")) // overwrite ok
    assert(ids(g.bipartiteSets._2) == Set(3L))
  }

  test("option mismatch guards match the reference") {
    val s = spark
    import s.implicits._
    val bi = NPartiteGraph.biPartite(star)
    intercept[IllegalArgumentException] {
      bi.addNodesFrom(Seq(0L).toDF(ID), multipartite = Some("p"))
    }
    val np = NPartiteGraph(star)
    assert(!np.isBipartite && np.isMultipartite)
    intercept[IllegalArgumentException] {
      np.addNodesFrom(Seq(0L).toDF(ID), bipartite = Some("p"))
    }
    intercept[IllegalArgumentException] { np.bipartiteSets }
    intercept[IllegalArgumentException] { bi.bipartiteSets } // none declared
  }

  test("multipartite: declared partitions in insertion order") {
    val g = NPartiteGraph(star)
    (0 to 2).foreach { r =>
      g.addNodesFrom(star.vertices.filter(pmod(col(ID), lit(3L)) === r),
        multipartite = Some(s"p$r"))
    }
    assert(g.partitionNames == Seq("p0", "p1", "p2"))
    val sets = g.partiteSets
    assert(ids(sets("p0")) == Set(0L, 3L, 6L))
    assert(ids(sets("p1")) == Set(1L, 4L))
    assert(ids(sets("p2")) == Set(2L, 5L))
  }

  test("all_nodes declaration overrides the vertex fallback") {
    val s = spark
    import s.implicits._
    val g = NPartiteGraph.biPartite(star)
    g.addNodesFrom(Seq(0L, 1L, 2L, 77L).toDF(ID)) // neither option
    g.addNodesFrom(Seq(0L).toDF(ID), bipartite = Some("top"))
    // complement is taken within the DECLARED node list, not edges
    assert(ids(g.bipartiteSets._2) == Set(1L, 2L, 77L))
  }
}
