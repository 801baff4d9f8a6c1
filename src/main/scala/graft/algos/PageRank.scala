package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.checkpoint.CheckpointManager
import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * PageRank with the reference's exact semantics
 * (`/root/reference/cpp/src/link_analysis/pagerank_impl.cuh:48-293`,
 * host oracle `/root/reference/cpp/tests/link_analysis/pagerank_test.cpp:43-130`):
 *
 *   - init pr = 1/V (uniform);
 *   - each iteration, from the OLD state:
 *       dangling_sum = sum of pr(v) over vertices with out-weight-sum 0
 *       pr'(v) = alpha * SUM over incoming edges u->v of pr(u) * w(u,v)/outw(u)
 *                + (dangling_sum * alpha + (1 - alpha)) / V
 *   - stop when L1(pr' - pr) < tol (checked after the update);
 *     give up (converged = false) at maxIter.
 *
 * Physical design (the part that must survive 100 TB):
 *   - Edge weights are pre-normalized once (w/outw(src)) and the edge
 *     table is hash-partitioned by src and cached — the per-iteration
 *     state join is then co-partitioned and ONLY the message reduce
 *     shuffles (~V rows of messages, never the edge table).
 *   - The message reduce is groupBy(dst).sum — Spark's partial (map-side)
 *     aggregation collapses hub fan-in before the shuffle, the same skew
 *     countermeasure as the reference's per-degree-segment kernels
 *     (`graph_view.hpp:258-262`); an algebraic reduce needs no extra
 *     hub salting.
 *   - Dangling mass is folded into one scalar per iteration
 *     (`pagerank_impl.cuh:218-246`), never V messages.
 *   - L1 diff and the next dangling-sum come from ONE agg over the
 *     freshly cached state: one shuffle job + one scalar job per iter.
 *   - Lineage is truncated EVERY superstep (see [[graft.core.Lineage]]),
 *     and committed to the resumable checkpoint every `checkpointEvery`
 *     supersteps when a [[CheckpointManager]] is given.
 */
object PageRank {

  final case class Config(
      alpha: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      checkpointEvery: Int = 10,
      checkpoint: Option[CheckpointManager] = None,
      algoName: String = "pagerank")

  final case class Result(
      ranks: DataFrame, // columns: id, pagerank
      iterations: Int,
      converged: Boolean,
      l1: Double)

  private val PR = "pr"
  private val OLD = "old_pr"
  private val DANG = "dangling"

  def run(g: LinkGraph, cfg: Config = Config()): Result = {
    val v = g.numVertices
    if (v == 0L) {
      return Result(g.spark.emptyDataFrame, 0, converged = true, 0.0)
    }
    val p = g.numPartitions

    // Pre-normalized edges: (src, dst, nw = w / outw(src)); any vertex
    // appearing as src has outw > 0. Partitioned by src, cached for the
    // whole run — its plan is static, so a DataFrame persist is fine.
    val ows = g.outWeightSums
    val normEdges = g.edges
      .join(ows.withColumnRenamed(ID, SRC), Seq(SRC))
      .select(col(SRC), col(DST), (col(WEIGHT) / col("out_weight")).as("nw"))
      .repartition(p, col(SRC))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // State: (id, pr, old_pr, dangling), hash-partitioned by id (same
    // Murmur3 family as the edge layout -> co-partitioned joins).
    val init = ows
      .select(col(ID), lit(1.0 / v).as(PR), lit(0.0).as(OLD),
        (col("out_weight") === 0.0).as(DANG))
      .repartition(p, col(ID))

    // Resume from the latest committed superstep, if any.
    val resume = cfg.checkpoint
      .flatMap(cm => cm.latestIteration(cfg.algoName).map(it =>
        (it, cm.restore(cfg.algoName, it).repartition(p, col(ID)))))

    var state = Lineage.materialize(resume.map(_._2).getOrElse(init))
    var iter = resume.map(_._1).getOrElse(0)
    var danglingSum = scalars(state.df)(0)

    var l1 = Double.MaxValue
    var converged = false
    while (!converged && iter < cfg.maxIter) {
      iter += 1
      val base = (danglingSum * cfg.alpha + (1.0 - cfg.alpha)) / v

      val msgs = normEdges
        .join(state.df.select(col(ID), col(PR)), normEdges(SRC) === col(ID))
        .select(col(DST), (col(PR) * col("nw")).as("m"))
        .groupBy(DST)
        .agg(sum("m").as("m"))

      val next = Lineage.materialize(
        state.df.join(msgs, state.df(ID) === msgs(DST), "left")
          .select(
            state.df(ID),
            (lit(cfg.alpha) * coalesce(col("m"), lit(0.0)) + lit(base)).as(PR),
            state.df(PR).as(OLD),
            state.df(DANG)))

      val Array(dSum, l1Now) = scalars(next.df)
      danglingSum = dSum
      l1 = l1Now
      converged = l1 < cfg.tol

      cfg.checkpoint.foreach { cm =>
        if (converged || iter % cfg.checkpointEvery == 0) {
          cm.commit(cfg.algoName, iter, next.df,
            Map("l1_diff" -> l1, "dangling_sum" -> danglingSum,
              "messages" -> v.toDouble))
        }
      }

      state.release()
      state = next
    }

    normEdges.unpersist()
    val ranks = state.df.select(col(ID), col(PR).as("pagerank"))
    Result(ranks, iter, converged, l1)
  }

  /** One pass over cached state: (dangling sum of pr, L1 vs old_pr). */
  private def scalars(state: DataFrame): Array[Double] = {
    val r = state.agg(
      sum(when(col(DANG), col(PR)).otherwise(0.0)),
      sum(abs(col(PR) - col(OLD)))).head()
    Array(if (r.isNullAt(0)) 0.0 else r.getDouble(0),
      if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }
}
