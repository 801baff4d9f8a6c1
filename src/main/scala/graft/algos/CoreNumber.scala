package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * Core number (k-core decomposition) — the reference's bucket peel
 * (`/root/reference/cpp/src/cores/core_number_impl.cuh:86-328`, INOUT
 * degrees on an undirected graph) re-expressed for Spark as the
 * H-INDEX ITERATION (Lü, Zhou, Zhang, Stanley 2016): starting from
 * c(v) = degree(v), repeatedly set c(v) to the h-index of its
 * neighbors' current values; the sequence is monotone non-increasing
 * and converges exactly to the core numbers.
 *
 * Why this shape instead of porting the peel: peeling is inherently
 * sequential in k (hundreds of tiny supersteps = scheduling-bound on a
 * cluster), while the h-index form converges in a few tens of
 * supersteps each of which is one co-partitioned join + one windowed
 * aggregation — the same physical pattern as every other algorithm
 * here. The h-index of a neighbor multiset is invariant to tie order,
 * so the result is deterministic.
 *
 * Returns (id, core_number); isolated / self-loop-only vertices get 0.
 */
object CoreNumber {

  def run(g0: LinkGraph, maxIter: Int = 1000): DataFrame =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, maxIter))

  private def runImpl(g0: LinkGraph, maxIter: Int): DataFrame = {
    val callerCached = g0.edges.storageLevel != StorageLevel.NONE
    val g = if (callerCached) g0 else g0.cached()
    val p = g.numPartitions

    val edges = g.edges.select(SRC, DST).filter(col(SRC) =!= col(DST))

    // init c = degree over self-loop-free edges (undirected input:
    // out-degree == degree); universe includes self-loop-only vertices
    // which start (and stay) at 0.
    val universe = g.edges.select(col(SRC).as(ID))
      .union(g.edges.select(col(DST).as(ID))).distinct()
    val degs = edges.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("c"))
    var state = Lineage.materialize(
      universe
        .join(degs, Seq(ID), "left")
        .select(col(ID), coalesce(col("c"), lit(0L)).as("c"))
        .repartition(p, col(ID)),
      eager = false)

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      iter += 1
      // h-index of neighbor values: sort each vertex's neighbor c's
      // descending, h = max over rank r of min(c, r).
      val w = Window.partitionBy(DST).orderBy(col("nc").desc)
      val h = edges
        .join(state.df.select(col(ID), col("c")).hint("shuffle_hash"),
          edges(SRC) === col(ID))
        .select(col(DST), col("c").as("nc"))
        .withColumn("r", row_number().over(w).cast("long"))
        .groupBy(DST)
        .agg(max(least(col("nc"), col("r"))).as("h"))

      val next = Lineage.materialize(
        state.df.join(h.hint("shuffle_hash"),
            state.df(ID) === h(DST), "left")
          .select(state.df(ID),
            least(state.df("c"), coalesce(col("h"), state.df("c"))).as("c"),
            (coalesce(col("h"), state.df("c")) < state.df("c")).as("chg")),
        eager = false)
      changed = next.df.filter(col("chg")).count()
      state.release()
      state = next
    }

    val out = Lineage.materialize(
      state.df.select(col(ID), col("c").as("core_number")))
    state.release()
    if (!callerCached) g.unpersist()
    out.df
  }
}
