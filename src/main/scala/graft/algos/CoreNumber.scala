package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * Core number (k-core decomposition) by iterative peeling — the
 * distributed analog of the reference's bucket-based peel
 * (`/root/reference/cpp/src/cores/core_number_impl.cuh:86-328`, here
 * fixed to degree type INOUT on an undirected graph, the common case;
 * [[TriangleCount.twoCore]] is the specialized k=2..2 instance the
 * reference's TC uses).
 *
 * Algorithm: for k = 1, 2, …: repeatedly remove vertices whose degree
 * in the remaining graph is ≤ k, assigning them core number = k,
 * until none; stop when the graph is empty. Superstep count is
 * O(degeneracy × peel-rounds), each a filter + map-side-combined
 * degree count — no joins beyond left-semi membership pruning.
 */
object CoreNumber {

  /** (id, core_number) for every vertex of the undirected graph. */
  def run(g0: LinkGraph, maxK: Int = 1 << 20): DataFrame =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, maxK))

  private def runImpl(g0: LinkGraph, maxK: Int): DataFrame = {
    val callerCached = g0.edges.storageLevel != StorageLevel.NONE
    val g = if (callerCached) g0 else g0.cached()
    val spark = g.spark
    import spark.implicits._

    var remaining = Lineage.materialize(
      g.edges.select(SRC, DST).filter(col(SRC) =!= col(DST)), eager = false)
    var assigned: DataFrame = Seq.empty[(Long, Long)].toDF(ID, "core_number")
    // Isolated/self-loop-only vertices never enter `remaining`: core 0.
    val all = g.edges.select(col(SRC).as(ID))
      .union(g.edges.select(col(DST).as(ID))).distinct()

    // Active = not-yet-assigned vertices; tracked explicitly because a
    // vertex whose last edges vanish (all neighbors peeled) has degree
    // 0 in `remaining` and would otherwise never be assigned.
    var active = Lineage.materialize(
      remaining.df.select(col(SRC).as(ID)).distinct(), eager = false)

    val handles = scala.collection.mutable.ArrayBuffer[Lineage.Handle]()
    var k = 0L
    var nActive = active.df.count()
    while (nActive > 0 && k < maxK) {
      k += 1
      var peeledAny = true
      while (peeledAny && nActive > 0) {
        val counts = remaining.df.groupBy(col(SRC).as(ID))
          .agg(count(lit(1)).as("d"))
        val peel = Lineage.materialize(
          active.df.join(counts, Seq(ID), "left")
            .filter(coalesce(col("d"), lit(0L)) <= k)
            .select(col(ID), lit(k).as("core_number")),
          eager = false)
        if (peel.df.count() == 0) { peel.release(); peeledAny = false }
        else {
          handles += peel
          assigned = assigned.union(peel.df.select(col(ID), col("core_number")))
          val ids = peel.df.select(ID)
          // eager: must be computed BEFORE remaining.release() — the
          // released cache is localCheckpointed (no lineage to recompute).
          val nextRemaining = Lineage.materialize(
            remaining.df
              .join(ids.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
              .join(ids.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
              .select(col(SRC), col(DST)))
          val nextActive = Lineage.materialize(
            active.df.join(ids, Seq(ID), "left_anti"), eager = false)
          nActive = nextActive.df.count()
          remaining.release(); remaining = nextRemaining
          active.release(); active = nextActive
        }
      }
    }

    val out = Lineage.materialize(
      all.join(assigned, Seq(ID), "left")
        .select(col(ID),
          coalesce(col("core_number"), lit(0L)).as("core_number")))
    handles.foreach(_.release())
    remaining.release()
    active.release()
    if (!callerCached) g.unpersist()
    out.df
  }
}
