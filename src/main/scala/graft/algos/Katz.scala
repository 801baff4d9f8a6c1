package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * Katz centrality, reference semantics
 * (`/root/reference/cpp/src/centrality/katz_centrality_impl.cuh:50-172`):
 * init katz = 0; per iteration katz'(v) = alpha * SUM over incoming
 * u->v of katz(u)*w + beta; stop when L1 diff < epsilon (error at
 * maxIter); optional final L2 normalization. Same co-partitioned
 * gather + shuffle-hash joins as PageRank.
 */
object Katz {

  final case class Config(
      alpha: Double = 0.1,
      beta: Double = 1.0,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      normalize: Boolean = true)

  final case class Result(centralities: DataFrame, iterations: Int, converged: Boolean)

  def run(g0: LinkGraph, cfg: Config = Config()): Result =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, cfg))

  private def runImpl(g0: LinkGraph, cfg: Config): Result = {
    val callerCached = g0.edges.storageLevel != StorageLevel.NONE
    val g = if (callerCached) g0 else g0.cached()
    val p = g.numPartitions

    val verts = Lineage.materialize(
      g.outWeightSums.select(col(ID)).repartition(p, col(ID)), eager = false)
    val init = verts.df.select(col(ID), lit(0.0).as("kz"), lit(0.0).as("old"))

    var state = Lineage.materialize(init, eager = false)
    var iter = 0
    var converged = false
    while (!converged && iter < cfg.maxIter) {
      iter += 1
      val msgs = g.edges
        .join(state.df.select(col(ID), col("kz")).hint("shuffle_hash"),
          g.edges(SRC) === col(ID))
        .select(col(DST), (col("kz") * col(WEIGHT)).as("m"))
        .groupBy(DST).agg(sum("m").as("m"))
      val next = Lineage.materialize(
        state.df.join(msgs.hint("shuffle_hash"),
            state.df(ID) === msgs(DST), "left")
          .select(state.df(ID),
            (lit(cfg.alpha) * coalesce(col("m"), lit(0.0)) + lit(cfg.beta))
              .as("kz"),
            state.df("kz").as("old")),
        eager = false)
      val l1 = next.df.agg(sum(abs(col("kz") - col("old")))).head().getDouble(0)
      converged = l1 < cfg.tol
      state.release()
      state = next
    }

    val out =
      if (cfg.normalize) {
        val l2 = math.sqrt(
          state.df.agg(sum(col("kz") * col("kz"))).head().getDouble(0))
        state.df.select(col(ID), (col("kz") / l2).as("katz"))
      } else state.df.select(col(ID), col("kz").as("katz"))

    verts.release()
    if (!callerCached) g.unpersist()
    Result(out, iter, converged)
  }
}
