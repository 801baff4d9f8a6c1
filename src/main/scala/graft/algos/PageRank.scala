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
      algoName: String = "pagerank",
      verbose: Boolean = false,
      // Personalized PageRank: (id, value) rows; the teleport/dangling
      // mass is redistributed proportionally to value/sum(value) over
      // the listed vertices instead of uniformly (reference
      // `pagerank_impl.cuh:229-246`, oracle `pagerank_test.cpp:110-121`).
      personalization: Option[DataFrame] = None,
      // Initial guess (id, value), normalized by its sum (reference
      // `pagerank_impl.cuh:166-183`); vertices absent from the guess
      // start at 0.
      initialGuess: Option[DataFrame] = None)

  final case class Result(
      ranks: DataFrame, // columns: id, pagerank
      iterations: Int,
      converged: Boolean,
      l1: Double)

  private val PR = "pr"
  private val OLD = "old_pr"
  private val DANG = "dangling"
  private val PW = "pw" // per-vertex teleport weight (1/V when uniform)

  def run(g0: LinkGraph, cfg: Config = Config()): Result =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, cfg))

  private def runImpl(g0: LinkGraph, cfg: Config): Result = {
    // Cache the edge table up front: vertex set, counts, out-weights and
    // normalized edges all derive from it — without this, an expensive
    // upstream plan (e.g. corpus extraction) would re-run per use.
    // Respect a caller-managed cache (don't re-layout or drop it).
    val callerCached = g0.edges.storageLevel != StorageLevel.NONE
    val g = if (callerCached) g0 else g0.cached()
    val p = g.numPartitions

    // One-pass out-weight table (id, out_weight) for EVERY vertex; its
    // count is V — no separate distinct-vertices pass. Hash-partitioned
    // by id: the state layout, and (via the renamed src join below)
    // co-partitioned with the cached edge table.
    val tSetup = System.nanoTime()
    def lap(tag: String): Unit = if (cfg.verbose) {
      println(f"[pagerank] setup:$tag ${(System.nanoTime() - tSetup) / 1e9}%.2f")
    }
    val ows = Lineage.materialize(
      g.outWeightSums.repartition(p, col(ID)), eager = false)
    val v = ows.df.count()
    lap("ows")
    if (v == 0L) {
      ows.release()
      if (!callerCached) g.unpersist()
      return Result(g.spark.emptyDataFrame, 0, converged = true, 0.0)
    }

    // Pre-normalized edges: (src, dst, nw = w / outw(src)); any vertex
    // appearing as src has outw > 0. The join is co-partitioned on src,
    // and its output KEEPS that partitioning — no explicit repartition,
    // so building normEdges shuffles nothing beyond the ows aggregate.
    val normEdges = g.edges
      .join(ows.df.withColumnRenamed(ID, SRC).hint("shuffle_hash"), Seq(SRC))
      .select(col(SRC), col(DST), (col(WEIGHT) / col("out_weight")).as("nw"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Per-vertex teleport weight: uniform 1/V, or value/sum over the
    // personalization vertices (0 elsewhere).
    val pwCol: DataFrame => DataFrame = cfg.personalization match {
      case None =>
        df => df.withColumn(PW, lit(1.0 / v))
      case Some(pers) =>
        val pSum = pers.agg(sum(col("value"))).head().getDouble(0)
        require(pSum > 0.0, "personalization values must sum > 0")
        val pn = pers.select(col(ID).as("__pid"),
          (col("value").cast("double") / pSum).as(PW))
        df => df.join(pn.hint("shuffle_hash"), df(ID) === col("__pid"), "left")
          .drop("__pid")
          .withColumn(PW, coalesce(col(PW), lit(0.0)))
    }

    // Initial scores: uniform 1/V, or the sum-normalized user guess.
    val prInit: DataFrame => DataFrame = cfg.initialGuess match {
      case None =>
        df => df.withColumn(PR, lit(1.0 / v))
      case Some(guess) =>
        val gSum = guess.agg(sum(col("value"))).head().getDouble(0)
        require(gSum > 0.0, "initial guess must sum > 0")
        val gn = guess.select(col(ID).as("__gid"),
          (col("value").cast("double") / gSum).as(PR))
        df => df.join(gn.hint("shuffle_hash"), df(ID) === col("__gid"), "left")
          .drop("__gid")
          .withColumn(PR, coalesce(col(PR), lit(0.0)))
    }

    // State: (id, pr, old_pr, dangling, pw) derives from ows in place.
    val init = prInit(pwCol(ows.df))
      .select(col(ID), col(PR), lit(0.0).as(OLD),
        (col("out_weight") === 0.0).as(DANG), col(PW))

    // Resume from the latest committed superstep, if any — but only
    // one committed for the SAME graph and config (fingerprint check).
    val fp = cfg.checkpoint.map(_.graphFingerprint(
      g.edges, "pagerank", cfg.alpha.toString,
      cfg.personalization.isDefined.toString)).getOrElse("")
    val resume = cfg.checkpoint
      .flatMap(cm => cm.latestIteration(cfg.algoName, fp).map(it =>
        (it, cm.restore(cfg.algoName, it).repartition(p, col(ID)))))

    var state = Lineage.materialize(resume.map(_._2).getOrElse(init), eager = false)
    var iter = resume.map(_._1).getOrElse(0)
    var danglingSum = scalars(state.df)(0)
    lap("init-state")

    var l1 = Double.MaxValue
    var converged = false
    while (!converged && iter < cfg.maxIter) {
      iter += 1
      val tIter = System.nanoTime()
      // Redistributed mass this superstep; multiplied by the per-vertex
      // teleport weight (uniform 1/V or personalized).
      val mass = danglingSum * cfg.alpha + (1.0 - cfg.alpha)

      // shuffle_hash hints: without them Catalyst picks sort-merge and
      // re-SORTS the (cached, unsorted) edge table every superstep —
      // bandwidth-bound and the dominant iteration cost. Hash-building
      // the per-partition slice of the small state side streams the
      // edges unsorted; unlike a broadcast this stays valid when V is
      // huge, because the build is per co-partition, not per task.
      val msgs = normEdges
        .join(state.df.select(col(ID), col(PR)).hint("shuffle_hash"),
          normEdges(SRC) === col(ID))
        .select(col(DST), (col(PR) * col("nw")).as("m"))
        .groupBy(DST)
        .agg(sum("m").as("m"))

      val nextPlan = state.df
        .join(msgs.hint("shuffle_hash"), state.df(ID) === msgs(DST), "left")
        .select(
          state.df(ID),
          (lit(cfg.alpha) * coalesce(col("m"), lit(0.0))
            + lit(mass) * state.df(PW)).as(PR),
          state.df(PR).as(OLD),
          state.df(DANG),
          state.df(PW))
      if (cfg.verbose && iter == 1 &&
          sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        nextPlan.explain("formatted")
      }
      val next = Lineage.materialize(nextPlan, eager = false)

      val tAgg = System.nanoTime()
      val Array(dSum, l1Now) = scalars(next.df)
      danglingSum = dSum
      l1 = l1Now
      converged = l1 < cfg.tol
      if (cfg.verbose) {
        val gc = java.lang.management.ManagementFactory
          .getGarbageCollectorMXBeans.stream()
          .mapToLong(_.getCollectionTime).sum()
        val tNow = System.nanoTime()
        println(f"[pagerank] iter=$iter%d total=${(tNow - tIter) / 1e9}%.2f " +
          f"plan=${(tAgg - tIter) / 1e9}%.2f agg=${(tNow - tAgg) / 1e9}%.2f " +
          f"l1=$l1%.2e gc_cum_ms=$gc%d")
      }

      cfg.checkpoint.foreach { cm =>
        if (converged || iter % cfg.checkpointEvery == 0) {
          cm.commit(cfg.algoName, iter, next.df,
            Map("l1_diff" -> l1, "dangling_sum" -> danglingSum,
              "messages" -> v.toDouble), fp)
        }
      }

      state.release()
      state = next
    }

    lap("loop-done")
    normEdges.unpersist()
    ows.release()
    if (!callerCached) g.unpersist()
    lap("unpersist-done")
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
