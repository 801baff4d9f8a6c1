package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

import graft.algos.ForceAtlas2
import graft.algos.ForceAtlas2.Config

/**
 * Layout quality + path parity for ForceAtlas2 (the reference checks
 * its layouts with a trustworthiness/score metric rather than exact
 * positions — cpp/tests/layout/force_atlas2_test.cu — so these tests
 * assert structural quality and engine invariants, while the exact
 * trajectory is oracle-gated by q_force_atlas2).
 */
class ForceAtlas2Spec extends SparkSpec {

  private def positions(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  private def dist(a: (Double, Double), b: (Double, Double)): Double =
    math.hypot(a._1 - b._1, a._2 - b._2)

  test("karate: adjacent pairs end up closer than non-adjacent pairs") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val pos = positions(ForceAtlas2.run(g, Config(maxIter = 60)))
    val adj = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val ids = pos.keys.toSeq.sorted
    val all = for (i <- ids; j <- ids if i < j) yield (i, j)
    val nonAdj = all.filterNot(adj.toSet)
    def mean(ps: Seq[(Long, Long)]): Double =
      ps.map { case (u, v) => dist(pos(u), pos(v)) }.sum / ps.size
    assert(pos.values.forall { case (x, y) => x.isFinite && y.isFinite })
    assert(mean(adj) < mean(nonAdj),
      s"adjacent mean ${mean(adj)} !< non-adjacent mean ${mean(nonAdj)}")
  }

  test("two planted cliques separate under the grid repulsion path") {
    val cliqueA = for (i <- 0L until 12L; j <- 0L until 12L if i != j) yield (i, j, 1.0)
    val cliqueB = for (i <- 20L until 32L; j <- 20L until 32L if i != j) yield (i, j, 1.0)
    val bridge = Seq((0L, 20L, 1.0), (20L, 0L, 1.0))
    val g = graphOf(cliqueA ++ cliqueB ++ bridge)
    // exactThreshold = 0 forces the grid path at every iteration.
    val pos = positions(
      ForceAtlas2.run(g, Config(maxIter = 40, exactThreshold = 0, maxCells = 64)))
    assert(pos.size == 24)
    assert(pos.values.forall { case (x, y) => x.isFinite && y.isFinite })
    val a = (0L until 12L).map(pos)
    val b = (20L until 32L).map(pos)
    def centroid(ps: Seq[(Double, Double)]) =
      (ps.map(_._1).sum / ps.size, ps.map(_._2).sum / ps.size)
    val (ca, cb) = (centroid(a), centroid(b))
    val spreadA = a.map(dist(_, ca)).max
    val spreadB = b.map(dist(_, cb)).max
    assert(dist(ca, cb) > math.max(spreadA, spreadB),
      s"cluster centroids ${dist(ca, cb)} not separated beyond spreads $spreadA/$spreadB")
  }

  test("grid path never executes a cartesian product over the vertex frame") {
    val edges = loadFixture("karate")
    val g = graphOf(edges)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = {
        if (qe.executedPlan.collect { case c: CartesianProductExec => c }.nonEmpty &&
            // the 1-row broadcast cell-array crossJoin is the designed
            // shape; a cartesian over the POS frame itself is not.
            qe.executedPlan.toString.contains("rx"))
          plans.add(qe.executedPlan.toString)
      }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      ForceAtlas2.run(g, Config(maxIter = 2, exactThreshold = 0, maxCells = 64)).collect()
      Thread.sleep(500) // listener delivery is async
      assert(plans.isEmpty, s"unexpected cartesian:\n${plans.peek()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("collapsed positions ride the occupancy guard and stay coherent") {
    // All vertices start at ONE point -> the whole layout is one grid
    // cell. With maxCellOccupancy below the count, that cell leaves
    // the exact near-field join (whose fanout is quadratic in the
    // cell's occupancy) and acts as a centroid super-vertex instead.
    // The guard is an approximation above the bound (the centroid of
    // n identical points differs from the point by float-sum ulps,
    // amplified by the 1/EPS distance floor and fed into FA2's
    // GLOBAL speed scalar), so the pin is behavioral: the run
    // completes, every vertex stays co-located with every other
    // (identical state => identical forces), positions are finite
    // and within a small drift of the unguarded trajectory.
    val n = 400L
    val edges = (0L until n).map(i => (i, (i + 1) % n, 1.0))
    val g = graphOf(edges)
    val s = spark; import s.implicits._
    val start = (0L until n).map(i => (i, 5.0, -3.0)).toDF("id", "x", "y")
    val guarded = positions(ForceAtlas2.run(g,
      Config(maxIter = 2, exactThreshold = 0, maxCellOccupancy = 16),
      Some(start)))
    val unguarded = positions(ForceAtlas2.run(g,
      Config(maxIter = 2, exactThreshold = 0), Some(start)))
    assert(guarded.size == n)
    assert(guarded.values.toSet.size == 1, "collapse coherence broken")
    val (gx, gy) = guarded(0L)
    val (ux, uy) = unguarded(0L)
    assert(!gx.isNaN && !gy.isNaN && gx.abs < 100 && gy.abs < 100)
    assert(math.abs(gx - ux) < 0.5 && math.abs(gy - uy) < 0.5,
      s"guarded ($gx,$gy) drifted from unguarded ($ux,$uy)")
  }

  test("explicit start positions are honored") {
    val g = graphOf(Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
    val s = spark; import s.implicits._
    val start = Seq((1L, -5.0, 0.0), (2L, 5.0, 0.0)).toDF("id", "x", "y")
    val pos = positions(ForceAtlas2.run(g, Config(maxIter = 1), Some(start)))
    // One iteration moves both vertices along the x axis only
    // (y forces are zero by symmetry of the start layout).
    assert(pos(1L)._2 == 0.0 && pos(2L)._2 == 0.0)
    assert(pos(1L)._1 < pos(2L)._1)
  }
}
