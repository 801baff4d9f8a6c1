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

  test("balanced cut k=4 refines the k=2 bisection; deterministic") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val vs = edges.map(_._1).distinct.toSet
    val k2 = Spectral.fiedlerCut(g).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val k4 = Spectral.balancedCut(g, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k4.keySet == vs) // total assignment
    assert(k4.values.forall(c => c >= 0 && c < 4))
    assert(k4.values.toSet.size >= 3, s"degenerate: ${k4.values.toSet}")
    // By construction clusters {0,1} are the low side, {2,3} the high.
    k4.foreach { case (v, c) =>
      assert((c < 2) == (k2(v) == 0L), s"vertex $v k4=$c k2=${k2(v)}")
    }
    val again = Spectral.balancedCut(g, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == k4)
    // Substituting a precomputed root bisection (the q_spectral /
    // q_spectral_k sharing path) is exact: only the recursion's first
    // cut call is replaced.
    val shared = Spectral.balancedCut(g, 4,
        rootCut = Some(Spectral.fiedlerCut(g))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shared == k4)
  }

  /** Host mirror of the modularity-matrix power iteration
   * (σI + B, B = W − k·kᵀ/2m). */
  private def hostModularity(
      edges: Seq[(Long, Long, Double)],
      iterations: Int,
      seed: Long): Map[Long, Double] = {
    val verts = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    val sigma = 2.0 * deg.values.max
    val w = deg.values.sum
    var x = verts.map { v =>
      v -> (RefOraclesY.md5u32(s"$seed:$v") % 1000000L / 1000000.0 - 0.5)
    }.toMap
    for (_ <- 1 to iterations) {
      val s = verts.map(v => deg(v) * x(v)).sum
      val msg = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      edges.foreach { case (u, v, ew) => msg(v) += ew * x(u) }
      val y = verts.map(v =>
        v -> (sigma * x(v) - deg(v) * (s / w) + msg(v))).toMap
      val mu = y.values.sum / verts.size
      val norm = math.sqrt(y.values.map(c => (c - mu) * (c - mu)).sum)
      x = y.map { case (v, c) => v -> (c - mu) / norm }
    }
    x
  }

  test("modularity cut on karate matches host power iteration and " +
      "beats the balanced cut's modularity") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val got = Spectral.modularityCut(g, Spectral.Config(iterations = 20))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = hostModularity(edges, 20, 42L)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, (micro, cluster)) =>
      assert(math.abs(micro - math.round(want(v) * 1e6)) <= 1,
        s"vertex $v micro $micro vs host ${want(v)}")
      if (math.abs(want(v)) > 1e-3)
        assert(cluster == (if (want(v) > 0) 1L else 0L), s"vertex $v side")
    }
    // The modularity objective must not lose to the balanced-cut
    // objective on its own metric (karate's two factions are the
    // canonical modularity fixture).
    import org.apache.spark.sql.functions.col
    val qMod = Spectral.analyzeClustering(g,
      Spectral.modularityCut(g).select(col("id"), col("cluster"))).modularity
    val qCut = Spectral.analyzeClustering(g,
      Spectral.fiedlerCut(g).select(col("id"), col("cluster"))).modularity
    assert(qMod >= qCut, s"modularity objective $qMod < balanced cut $qCut")
    assert(qMod > 0.3, s"karate bipartition modularity $qMod suspiciously low")
  }

  test("modularity maximization k=4 assigns the full range deterministically") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val k4 = Spectral.modularityMaximization(g, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k4.keySet == edges.map(_._1).distinct.toSet)
    assert(k4.values.forall(c => c >= 0 && c < 4))
    assert(k4.values.toSet.size >= 3, s"degenerate: ${k4.values.toSet}")
    val again = Spectral.modularityMaximization(g, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == k4)
  }

  test("analyzeClustering metrics match a host recomputation") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val labels = Spectral.balancedCut(g, 3)
    val m = Spectral.analyzeClustering(g, labels)
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Host: edge cut / ratio cut / modularity from the same labels.
    val cutW = edges.collect {
      case (u, v, w) if lab(u) != lab(v) => w
    }.sum / 2.0
    val sizes = lab.values.groupBy(identity).view.mapValues(_.size).toMap
    val perClusterCut = edges
      .filter { case (u, v, _) => lab(u) != lab(v) }
      .groupBy { case (u, _, _) => lab(u) }
      .view.mapValues(_.map(_._3).sum).toMap
    val ratio = sizes.map { case (c, n) =>
      perClusterCut.getOrElse(c, 0.0) / n
    }.sum
    val t = edges.map(_._3).sum
    val internal = edges.collect {
      case (u, v, w) if lab(u) == lab(v) => w
    }.sum
    val kk = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
      .withDefaultValue(0.0)
    val a = lab.keys.toSeq.groupBy(lab).values.map(_.map(kk).sum)
    val q = internal / t - a.map(x => x * x).sum / (t * t)

    assert(math.abs(m.edgeCut - cutW) < 1e-9, s"${m.edgeCut} vs $cutW")
    assert(math.abs(m.ratioCut - ratio) < 1e-9, s"${m.ratioCut} vs $ratio")
    assert(math.abs(m.modularity - q) < 1e-9, s"${m.modularity} vs $q")
  }
}
