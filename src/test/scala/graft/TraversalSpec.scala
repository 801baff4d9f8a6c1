package graft

import org.apache.spark.sql.functions._

import graft.algos.{Bfs, RandomWalks, Sssp}

class MultiSourceBfsSpec extends SparkSpec {
  test("multiSource equals one independent Bfs.run per source") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val srcs = Seq(0L, 5L, 33L)
    val got = Bfs.multiSource(g, srcs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val want = srcs.flatMap { s =>
      Bfs.run(g, Seq(s)).collect()
        .map(r => (s, r.getLong(0)) -> (r.getLong(1), r.getLong(2)))
    }.toMap
    assert(got == want)
  }
}

class SsspSpec extends SparkSpec {
  test("sssp distances match Dijkstra; predecessors consistent") {
    val edges = loadFixture("karate").map { case (s, d, _) =>
      // deterministic pseudo-weights 1..9
      (s, d, ((s * 7 + d * 13) % 9 + 1).toDouble)
    }
    val g = graphOf(edges)
    val got = Sssp.run(g, 0L).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    // driver-side Dijkstra
    val out = edges.groupBy(_._1)
    val dist = scala.collection.mutable.Map(0L -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, 0L))(
      Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, v) = pq.dequeue()
      if (d <= dist(v)) {
        out.getOrElse(v, Nil).foreach { case (_, u, w) =>
          if (d + w < dist.getOrElse(u, Double.MaxValue)) {
            dist(u) = d + w; pq.enqueue((d + w, u))
          }
        }
      }
    }
    assert(got.view.mapValues(_._1).toMap == dist.toMap)
    got.foreach { case (v, (d, p)) =>
      if (v != 0L) {
        val w = edges.filter(e => e._1 == p && e._2 == v).map(_._3).min
        assert(math.abs(dist(p) + w - d) < 1e-9, s"pred($v)=$p")
      }
    }
  }
}

class RandomWalksSpec extends SparkSpec {
  test("walks are deterministic, follow edges, and have full length") {
    val s = spark
    import s.implicits._
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val starts = Seq(0L, 1L, 2L, 3L).toDF("id")
    def collectWalks() = RandomWalks
      .run(g, starts, RandomWalks.Config(length = 5, seed = 7L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w1 = collectWalks()
    val w2 = collectWalks()
    assert(w1 == w2) // deterministic
    val edgeSet = edges.map(e => (e._1, e._2)).toSet
    // karate has no sinks: every walk has steps 0..5 and each hop is an edge
    for (st <- Seq(0L, 1L, 2L, 3L); k <- 0 to 5) {
      assert(w1.contains((st, k.toLong)), s"missing step $k of walk $st")
      if (k > 0) assert(edgeSet.contains((w1((st, k - 1L)), w1((st, k.toLong)))))
    }
    assert(w1((0L, 0L)) == 0L)
    // a different seed changes at least one step
    val w3 = RandomWalks.run(g, starts, RandomWalks.Config(length = 5, seed = 8L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w3 != w1)
  }
}
