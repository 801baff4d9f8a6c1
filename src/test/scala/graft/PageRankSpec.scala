package graft

import graft.algos.PageRank

class PageRankSpec extends SparkSpec {

  private def runAndCompare(fixture: String, tol: Double = 1e-6): Unit = {
    val edges = loadFixture(fixture)
    val g = graphOf(edges)
    val res = PageRank.run(g, PageRank.Config(alpha = 0.85, tol = 1e-6))
    assert(res.converged, s"$fixture: did not converge in ${res.iterations} iters")
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = RefOracles.pagerank(edges, vertices, 0.85, 1e-6)
    assert(got.keySet == want.keySet)
    val maxDiff = want.map { case (v, p) => math.abs(got(v) - p) }.max
    assert(maxDiff < tol * 1.1, s"$fixture: max |spark - oracle| = $maxDiff")
    // probability mass ≈ 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pagerank matches reference oracle on karate (allclose 1e-6)") {
    runAndCompare("karate")
  }

  test("pagerank matches reference oracle on dolphins") {
    runAndCompare("dolphins")
  }

  test("pagerank handles dangling vertices (directed chain)") {
    // 0 -> 1 -> 2, vertex 2 dangling; plus isolated-ish 3 -> 2.
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (3L, 2L, 1.0))
    val g = graphOf(edges)
    val res = PageRank.run(g, PageRank.Config())
    assert(res.converged)
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = RefOracles.pagerank(edges, Seq(0L, 1L, 2L, 3L))
    want.foreach { case (v, p) => assert(math.abs(got(v) - p) < 1.1e-6) }
  }

  test("personalized pagerank matches reference oracle on karate") {
    val s = spark
    import s.implicits._
    val edges = loadFixture("karate")
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val pers = Map(0L -> 3.0, 5L -> 1.0)
    val g = graphOf(edges)
    val res = PageRank.run(g, PageRank.Config(tol = 1e-8,
      personalization = Some(pers.toSeq.toDF("id", "value"))))
    assert(res.converged)
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = RefOracles.pagerank(edges, vertices, 0.85, 1e-8,
      personalization = Some(pers))
    val maxDiff = want.map { case (v, p) => math.abs(got(v) - p) }.max
    assert(maxDiff < 1.1e-6, s"max diff $maxDiff")
    // teleport mass concentrates near the personalization vertices
    assert(got(0L) > 2 * (1.0 / vertices.size))
  }

  test("initial guess is sum-normalized and converges to the same fixpoint") {
    val s = spark
    import s.implicits._
    val edges = loadFixture("karate")
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val guess = vertices.map(v => v -> (v + 1).toDouble).toMap
    val g = graphOf(edges)
    val res = PageRank.run(g, PageRank.Config(tol = 1e-8,
      initialGuess = Some(guess.toSeq.toDF("id", "value"))))
    assert(res.converged)
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = RefOracles.pagerank(edges, vertices, 0.85, 1e-8,
      initialGuess = Some(guess))
    want.foreach { case (v, p) => assert(math.abs(got(v) - p) < 1.1e-6) }
  }

  test("pagerank respects edge weights") {
    val edges = Seq((0L, 1L, 3.0), (0L, 2L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0))
    val g = graphOf(edges)
    val got = PageRank.run(g, PageRank.Config()).ranks
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = RefOracles.pagerank(edges, Seq(0L, 1L, 2L))
    want.foreach { case (v, p) => assert(math.abs(got(v) - p) < 1.1e-6) }
    assert(got(1L) > got(2L)) // heavier edge attracts more rank
  }
}
