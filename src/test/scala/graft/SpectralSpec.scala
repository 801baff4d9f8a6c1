package graft

import graft.algos.Spectral

class SpectralSpec extends SparkSpec {

  /** Host mirror of the deflated power iteration (dense, sequential).
   * Float sums associate differently than the distributed engine, so
   * comparisons allow last-ulp-amplified slack. */
  private def hostFiedler(
      edges: Seq[(Long, Long, Double)],
      iterations: Int,
      seed: Long): Map[Long, Double] = {
    val verts = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    val sigma = 2.0 * deg.values.max
    var x = verts.map { v =>
      v -> (RefOraclesY.md5u32(s"$seed:$v") % 1000000L / 1000000.0 - 0.5)
    }.toMap
    for (_ <- 1 to iterations) {
      val msg = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      edges.foreach { case (u, v, w) => msg(v) += w * x(u) }
      val y = verts.map(v => v -> ((sigma - deg(v)) * x(v) + msg(v))).toMap
      val mu = y.values.sum / verts.size
      val norm = math.sqrt(y.values.map(c => (c - mu) * (c - mu)).sum)
      x = y.map { case (v, c) => v -> (c - mu) / norm }
    }
    x
  }

  test("fiedler cut on karate matches host power iteration") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val got = Spectral.fiedlerCut(g, Spectral.Config(iterations = 20))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = hostFiedler(edges, 20, 42L)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, (micro, cluster)) =>
      assert(math.abs(micro - math.round(want(v) * 1e6)) <= 1,
        s"vertex $v micro $micro vs host ${want(v)}")
      if (math.abs(want(v)) > 1e-3)
        assert(cluster == (if (want(v) > 0) 1L else 0L), s"vertex $v side")
    }
    // a real bipartition: both sides populated
    val sizes = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0L, 1L))
    assert(sizes.values.min >= 5, s"degenerate split $sizes")
  }

  test("fiedler cut is deterministic across runs") {
    val edges = loadFixture("dolphins")
    val g = graphOf(edges)
    val a = Spectral.fiedlerCut(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Spectral.fiedlerCut(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
