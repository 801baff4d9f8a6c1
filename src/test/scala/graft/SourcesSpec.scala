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

class DenseAdjacencySpec extends SparkSpec {

  test("toDenseAdjacency emits a full V-row matrix with zeros for non-edges") {
    val g = graphOf(Seq((0L, 2L, 3.5), (2L, 0L, 1.0), (1L, 1L, 2.0)))
    val rows = LinkGraph.toDenseAdjacency(g).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.keySet == Set(0L, 1L, 2L))
    assert(rows(0L) == Seq(0.0, 0.0, 3.5))
    assert(rows(1L) == Seq(0.0, 2.0, 0.0)) // self-loop on the diagonal
    assert(rows(2L) == Seq(1.0, 0.0, 0.0))
  }

  test("isolated trailing ids get an all-zero row; multi-edges take min") {
    val s = spark
    import s.implicits._
    // vertices 1 and 2 never appear in an edge: they still get rows.
    val e = Seq((0L, 3L, 2.0), (0L, 3L, 5.0)).toDF("src", "dst", "weight")
    val g = LinkGraph(e, directed = true, 4)
    val rows = LinkGraph.toDenseAdjacency(g).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.size == 4)
    assert(rows(0L) == Seq(0.0, 0.0, 0.0, 2.0)) // min of the parallel pair
    assert(rows(1L) == Seq(0.0, 0.0, 0.0, 0.0))
    assert(rows(2L) == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("fromDenseAdjacency(toDenseAdjacency) round-trips the edge list") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val dense = LinkGraph.toDenseAdjacency(g)
    val back = LinkGraph.fromDenseAdjacency(dense, "id", "row")
    val got = back.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == edges.toSet)
  }

  test("toDenseAdjacency refuses graphs past maxVertices (V^2 guard)") {
    val g = graphOf(Seq((0L, 99L, 1.0)))
    val ex = intercept[IllegalArgumentException] {
      LinkGraph.toDenseAdjacency(g, maxVertices = 10)
    }
    assert(ex.getMessage.contains("maxVertices"))
  }
}

class MultiRmatSpec extends SparkSpec {

  test("multiRmat is deterministic and respects the scale envelope") {
    val a = Generators.multiRmat(spark, nGraphs = 3, minScale = 4,
      maxScale = 6, edgeFactor = 4, seed = 42L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val b = Generators.multiRmat(spark, nGraphs = 3, minScale = 4,
      maxScale = 6, edgeFactor = 4, seed = 42L)
      .repartition(7).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(a == b) // splittable counter draws: partitioning-independent
    val byGraph = a.groupBy(_._1)
    assert(byGraph.keySet == Set(0, 1, 2))
    byGraph.foreach { case (_, rows) =>
      // |E| = 2^scale * edgeFactor for some scale in [4, 6], and every
      // endpoint fits the graph's own 2^scale vertex space.
      val scale = (4 to 6).find(s => rows.size == (1L << s) * 4)
      assert(scale.isDefined, s"edge count ${rows.size} not 2^s*4")
      val n = 1L << scale.get
      assert(rows.forall(r => r._2 >= 0 && r._2 < n && r._3 >= 0 && r._3 < n))
    }
  }

  test("each member graph equals the single-rmat stream for its derived seed") {
    import graft.corpus.Rmat
    val got = Generators.multiRmat(spark, nGraphs = 2, minScale = 4,
      maxScale = 5, edgeFactor = 2, seed = 7L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(r => (r._2, r._3)).toSeq.sorted
      }
    (0 until 2).foreach { i =>
      val scale = 4 + Math.floorMod(Rmat.mix64(7L ^ (i + 1L)), 2L).toInt
      val want = Rmat.edges(Rmat.mix64(7L + i), scale, 2).sorted
      assert(got(i) == want)
    }
  }
}
