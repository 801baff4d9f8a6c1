package graft

import org.apache.spark.sql.functions._

import graft.algos.{Bipartite, Hungarian}
import graft.core.LinkGraph

class BipartiteSpec extends SparkSpec {

  private def undirected(pairs: (Long, Long)*): LinkGraph =
    graphOf(pairs.flatMap(p =>
      Seq((p._1, p._2, 1.0), (p._2, p._1, 1.0))))

  test("even cycle is bipartite, odd cycle is not") {
    val c4 = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(Bipartite.check(c4) == Bipartite.Result(true, 0L))
    val c5 = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    val r = Bipartite.check(c5)
    assert(!r.isBipartite && r.merged == 5L) // every C5 vertex is on the odd cycle
  }

  test("self-loop breaks bipartiteness on its own") {
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 0L, 1.0), (2L, 2L, 1.0)))
    val r = Bipartite.check(g)
    assert(!r.isBipartite && r.merged == 1L)
  }

  test("merged is per-component: odd component counted, even not") {
    // component A: square (bipartite); component B: triangle (odd)
    val g = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    val r = Bipartite.check(g)
    assert(!r.isBipartite && r.merged == 3L)
  }

  test("directed input is symmetrized before the check") {
    // single-direction triangle: still an odd cycle undirected
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0)))
    assert(!Bipartite.check(g).isBipartite)
  }

  test("matches a host BFS 2-coloring on 40 random graphs") {
    // Mix of shapes: sparse ER (often forests => bipartite) and denser
    // ER (odd cycles almost surely); host oracle colors by BFS parity
    // per component and checks for a same-color edge.
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val n = 3 + rnd.nextInt(12)
      val dense = trial % 2 == 0
      val pairs = for {
        u <- 0 until n; v <- (u + 1) until n
        if rnd.nextDouble() < (if (dense) 0.35 else 0.12)
      } yield (u.toLong, v.toLong)
      if (pairs.nonEmpty) {
        val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
        var color = Map.empty[Long, Int]
        var ok = true
        for (s <- adj.keys.toSeq.sorted if !color.contains(s)) {
          color += s -> 0
          var q = List(s)
          while (q.nonEmpty) {
            val v = q.head; q = q.tail
            for (w <- adj(v)) {
              if (!color.contains(w)) { color += w -> (1 - color(v)); q ::= w }
              else if (color(w) == color(v)) ok = false
            }
          }
        }
        val g = undirected(pairs: _*)
        assert(Bipartite.check(g).isBipartite == ok,
          s"trial $trial n=$n pairs=$pairs")
      }
    }
  }

  test("isMultigraph reflects parallel edges in the data") {
    val s = spark
    import s.implicits._
    val multi = LinkGraph(Seq((0L, 1L, 1.0), (0L, 1L, 2.0))
      .toDF("src", "dst", "weight"), directed = true, 2)
    assert(multi.isMultigraph)
    val simple = LinkGraph(Seq((0L, 1L, 1.0), (1L, 0L, 2.0))
      .toDF("src", "dst", "weight"), directed = true, 2)
    assert(!simple.isMultigraph)
  }
}

class DenseHungarianSpec extends SparkSpec {
  test("assignDense equals assign on the exploded cost matrix") {
    val s = spark
    import s.implicits._
    val dense = Seq(
      (0L, Seq(4.0, 1.0, 3.0)),
      (1L, Seq(2.0, 0.0, 5.0)),
      (2L, Seq(3.0, 2.0, 2.0))).toDF("id", "row")
    val sparse = dense.select(col("id"),
        posexplode(col("row")).as(Seq("j", "cost")))
    val a = Hungarian.assignDense(dense, "id", "row")
    val b = Hungarian.assign(sparse)
    assert(a.totalCost == b.totalCost)
    assert(a.assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == b.assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(a.totalCost == 5.0) // 0->1 (1), 1->0 (2), 2->2 (2)
  }
}
