package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * k-truss subgraph: the maximal subgraph in which every edge
 * participates in at least (k-2) triangles within the subgraph
 * (reference `/root/reference/cpp/src/community/ktruss.cu`, API
 * `/root/reference/cpp/include/cugraph/algorithms.hpp:371`).
 *
 * Iterative support peel, the same shape the reference's HORNET-based
 * kernel iterates on device:
 *
 *   1. canonicalize each undirected edge as (min, max);
 *   2. per round: per-edge support |N(u) ∩ N(v)| over the CURRENT
 *      subgraph, via sorted adjacency arrays + array_intersect — the
 *      TriangleCount join shape (adjacency is built once per round and
 *      hash-partitioned on the join key, so the support join is
 *      co-partitioned);
 *   3. drop edges with support < k-2; repeat until no edge drops.
 *
 * Rounds are bounded by the peel depth (small for web-like graphs);
 * each round's cost is one triangle enumeration over a shrinking edge
 * set. Expects an undirected (symmetrized, deduped) graph.
 *
 * Returns the surviving CANONICAL edge list (src < dst).
 */
object KTruss {

  /** Peel rounds taken by the most recent [[subgraph]] call (used to
   * size the unrolled SQL oracle). */
  @volatile var lastRounds: Int = 0

  def subgraph(g0: LinkGraph, k: Int, maxIter: Int = 100): DataFrame =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, k, maxIter))

  private def runImpl(g0: LinkGraph, k: Int, maxIter: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val p = g0.numPartitions
    val minSupport = k - 2

    var cur = Lineage.materialize(
      g0.edges.filter(col(SRC) =!= col(DST))
        .select(least(col(SRC), col(DST)).as(SRC),
          greatest(col(SRC), col(DST)).as(DST))
        .distinct()
        .repartition(p, col(SRC)),
      eager = false)
    var n = cur.df.count()
    var changed = n > 0
    var it = 0

    while (changed && n > 0 && it < maxIter) {
      it += 1
      val sym = cur.df.union(cur.df.select(col(DST).as(SRC), col(SRC).as(DST)))
      val adj = sym.groupBy(col(SRC).as(ID))
        .agg(sort_array(collect_list(col(DST))).as("nbrs"))
        .repartition(p, col(ID))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val adjU = adj.select(col(ID).as(SRC), col("nbrs").as("nu"))
      val adjV = adj.select(col(ID).as(DST), col("nbrs").as("nv"))
      val survivors = cur.df
        .join(adjU, Seq(SRC))
        .join(adjV, Seq(DST))
        .filter(size(array_intersect(col("nu"), col("nv"))) >= minSupport)
        .select(SRC, DST)
      val next = Lineage.materialize(
        survivors.repartition(p, col(SRC)), eager = false)
      val m = next.df.count()
      adj.unpersist()
      changed = m < n
      n = m
      cur.release()
      cur = next
    }
    lastRounds = it
    cur.df
  }
}
