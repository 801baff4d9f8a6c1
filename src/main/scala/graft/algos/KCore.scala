package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * Generic k-core subgraph: the maximal subgraph in which every vertex
 * has degree >= k (reference `/root/reference/cpp/src/cores/k_core_impl.cuh`,
 * API `/root/reference/cpp/include/cugraph/algorithms.hpp:1636`; the
 * legacy entry `algorithms.hpp:410` peels against core numbers).
 *
 * Two entry points, matching the reference's two call shapes:
 *  - [[subgraph]]: iterative degree peel to fixpoint — each round is
 *    one map-side-combined groupBy (degree) + two semi-joins (edge
 *    filter), all hash-partitioned on the vertex key, so a round
 *    shuffles only the shrinking edge set;
 *  - [[fromCoreNumbers]]: one-shot extraction given a precomputed
 *    core-number table (the reference's k_core(graph, k, core_numbers)
 *    overload) — keeps edges whose BOTH endpoints have core >= k,
 *    which equals the peel fixpoint by the core decomposition
 *    hierarchy.
 *
 * Expects an undirected (symmetrized, deduped) graph, like the
 *  reference (`k_core_impl.cuh` requires symmetric).
 */
object KCore {

  /** Peel rounds taken by the most recent [[subgraph]] call (used to
   * size the unrolled SQL oracle). */
  @volatile var lastRounds: Int = 0

  /** Iterative peel. `degreeType` (reference `algorithms.hpp:1636`):
   * Out counts src-side edges (= total degree on a symmetric table —
   * the undirected default), In counts dst-side, InOut both. Every
   * vertex of the graph must survive the typed-degree test; edges keep
   * only surviving endpoints. */
  def subgraph(
      g: LinkGraph,
      k: Int,
      maxIter: Int = 100,
      degreeType: CoreNumber.DegreeType = CoreNumber.Out): LinkGraph = {
    require(k >= 1, s"k must be >= 1, got $k")
    var cur = Lineage.materialize(
      g.edges.filter(col(SRC) =!= col(DST)), eager = false)
    var n = cur.df.count()
    var changed = n > 0
    var it = 0
    while (changed && n > 0 && it < maxIter) {
      it += 1
      val degStream = degreeType match {
        case CoreNumber.Out => cur.df.select(col(SRC).as(ID))
        case CoreNumber.In => cur.df.select(col(DST).as(ID))
        case CoreNumber.InOut => cur.df.select(col(SRC).as(ID))
          .union(cur.df.select(col(DST).as(ID)))
      }
      val keep = degStream.groupBy(ID).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(ID)
      // The survivor set is bounded by V <= 2·(edge rows): broadcast
      // it into BOTH semi-joins when it fits (guide §3.1) — the
      // dst-side semi-join otherwise re-exchanges the whole edge
      // table every peel round (its layout is hash(src)). Past the
      // bound the shuffled semi-joins run as before.
      val bcastKeep = n * 64L < (64L << 20)
      val keepS = keep.withColumnRenamed(ID, SRC)
      val keepD = keep.withColumnRenamed(ID, DST)
      val pruned = cur.df
        .join(if (bcastKeep) broadcast(keepS) else keepS, Seq(SRC), "left_semi")
        .join(if (bcastKeep) broadcast(keepD) else keepD, Seq(DST), "left_semi")
      val next = Lineage.materialize(pruned, eager = false)
      val m = next.df.count()
      changed = m < n
      n = m
      cur.release()
      cur = next
    }
    lastRounds = it
    LinkGraph(cur.df, g.directed, g.numPartitions)
  }

  /** One-shot k-core given core numbers (id, core_number): keep edges
   * whose both endpoints have core_number >= k. */
  def fromCoreNumbers(g: LinkGraph, coreNumbers: DataFrame, k: Int): LinkGraph = {
    val keep = coreNumbers
      .filter(col("core_number") >= k)
      .select(col(ID))
    g.inducedSubgraph(keep)
  }
}
