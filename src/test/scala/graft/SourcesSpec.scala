package graft

import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.corpus.Generators
import graft.sources.Mtx

class GeneratorsSpec extends SparkSpec {

  test("path / complete / star / grid shapes") {
    assert(Generators.path(spark, 10).count() == 9)
    assert(Generators.complete(spark, 8).count() == 8 * 7 / 2)
    assert(Generators.star(spark, 10).count() == 9)
    // 5x4 grid: right edges 5*(4-1)=15, down edges (5-1)*4=16
    assert(Generators.grid2d(spark, 5, 4).count() == 31)
    // path endpoints
    val pe = Generators.path(spark, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pe == Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("erdos-renyi: deterministic, canonical, plausible density") {
    val e1 = Generators.erdosRenyi(spark, 60, 0.2, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e2 = Generators.erdosRenyi(spark, 60, 0.2, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1 == e2)
    e1.foreach { case (u, v) => assert(u < v && v < 60) }
    val n = 60 * 59 / 2.0
    assert(e1.size > n * 0.1 && e1.size < n * 0.3) // ~0.2 ± slack
    // different seed -> different graph
    val e3 = Generators.erdosRenyi(spark, 60, 0.2, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1 != e3)
  }
}

class MtxSpec extends SparkSpec {

  test("mtx write/read round trip preserves edges and weights") {
    val s = spark
    import s.implicits._
    val edges = Seq((0L, 1L, 1.5), (1L, 2L, 2.0), (4L, 0L, 0.25))
      .toDF("src", "dst", "weight")
    val dir = java.nio.file.Files.createTempDirectory("mtx").toString
    val path = s"$dir/g.mtx"
    Mtx.write(edges, path)
    val back = Mtx.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set((0L, 1L, 1.5), (1L, 2L, 2.0), (4L, 0L, 0.25)))
    // header sanity: n = max id + 1, nnz = 3
    val first2 = scala.io.Source.fromFile(path).getLines().take(2).toList
    assert(first2.head.startsWith("%%MatrixMarket"))
    assert(first2(1) == "5 5 3")
  }

  test("mtx read tolerates comments and pattern (weightless) rows") {
    val dir = java.nio.file.Files.createTempDirectory("mtx").toString
    val path = s"$dir/p.mtx"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "%%MatrixMarket matrix coordinate pattern general\n% comment\n3 3 2\n1 2\n3 1\n")
    val got = Mtx.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 1L, 1.0), (2L, 0L, 1.0)))
  }
}

class AdjListSpec extends SparkSpec {

  test("fromAdjList explodes to the expected edge table") {
    val s = spark
    import s.implicits._
    val adj = Seq(
      (0L, Seq(1L, 2L)),
      (1L, Seq(0L)),
      (2L, Seq.empty[Long])).toDF("id", "nbrs")
    val g = LinkGraph.fromAdjList(adj, "id", "nbrs")
    val got = g.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 0L)))
  }

  test("fromAdjList round-trips collect_list of an edge table") {
    val edges = loadFixture("karate").map(e => (e._1, e._2)).toSet
    val g0 = graphOf(edges.toSeq.map(e => (e._1, e._2, 1.0)))
    val adj = g0.edges.groupBy(col("src").as("id"))
      .agg(collect_list(col("dst")).as("nbrs"))
    val got = LinkGraph.fromAdjList(adj, "id", "nbrs").edges
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == edges)
  }
}
