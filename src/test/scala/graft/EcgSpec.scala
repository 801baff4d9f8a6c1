package graft

import graft.algos.{Ecg, Louvain}

class EcgSpec extends SparkSpec {

  private def karate() = {
    val edges = loadFixture("karate")
    graphOf(edges)
  }

  test("ecg votes: range, determinism, weight formula") {
    val g = karate()
    val cfg = Ecg.Config(ensembleSize = 3, innerIter = 3, seed = 42L)
    val v1 = Ecg.runVotes(g, cfg).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getDouble(4)))).toMap
    val v2 = Ecg.runVotes(g, cfg).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getDouble(4)))).toMap
    assert(v1 == v2)
    assert(v1.nonEmpty)
    v1.foreach { case ((u, w), (votes, wt)) =>
      assert(u < w)
      assert(votes >= 0 && votes <= 3)
      assert(math.abs(wt - (0.05 + 0.95 * votes / 3.0)) < 1e-12)
    }
    // the ensemble must actually agree on something
    assert(v1.values.exists(_._1 > 0))
  }

  test("ecg full run clusters karate sensibly") {
    val g = karate()
    val r = Ecg.run(g, Ecg.Config(ensembleSize = 3, innerIter = 3,
      seed = 42L))
    val labels = r.labels.collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels.keySet == (0L to 33L).toSet)
    val k = labels.values.toSet.size
    assert(k >= 2 && k <= 10, s"community count $k")
    // final Louvain on the ECG-reweighted graph should be no worse
    // than chance and comparable to plain Louvain
    assert(r.modularity > 0.2)
    val plain = Louvain.run(karate()).modularity
    assert(r.modularity > plain - 0.15)
  }
}
