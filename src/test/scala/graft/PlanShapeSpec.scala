package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * Physical-plan regression tests: the scale posture ("the message
 * reduce is the ONLY per-superstep exchange") is an explicit claim in
 * BENCH.md/README — these specs pin it so a refactor that silently
 * reintroduces an exchange fails CI, not a 100 TB run.
 */
class PlanShapeSpec extends SparkSpec {

  private def exchanges(df: DataFrame): Int =
    // count live exchange operators in the executed plan; a plain
    // string count would also match the frozen plan text stored
    // inside InMemoryRelation nodes
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.length

  private def cachedGraph(): LinkGraph = {
    val edges = loadFixture("karate")
    graphOf(edges).cached()
  }

  test("superstep join + message reduce = exactly one exchange") {
    val g = cachedGraph()
    g.edges.count() // materialize the cache
    val p = g.numPartitions
    val state = g.edges.select(col(SRC).as(ID)).distinct()
      .select(col(ID), col(ID).cast("double").as("x"))
      .repartition(p, col(ID))
    // the PageRank/WCC/LPA superstep shape
    val msgs = g.edges
      .join(state.hint("shuffle_hash"), g.edges(SRC) === state(ID))
      .select(col(DST), col("x"))
      .groupBy(DST).agg(sum("x"))
    graft.core.SparkTuning.withoutAqe(spark) {
      msgs.count() // force execution so executedPlan is final
      assert(exchanges(msgs) == 1,
        msgs.queryExecution.executedPlan.toString)
    }
    g.unpersist()
  }

  test("neighbor sampling executes no window and no unbounded collect") {
    // The fanout sample must stay a bounded min-k AGGREGATION: a
    // per-src window rank (round-2 implementation) sorts a mega-hub's
    // whole adjacency in one task. The run materializes intermediates
    // (opaque final plan), so capture EVERY plan executed during the
    // call via a listener and pin: no WindowExec, no
    // collect_list/collect_set anywhere.
    val g = cachedGraph()
    g.edges.count()
    import spark.implicits._
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        plans.add(qe.executedPlan.toString)
        val hasWindow = qe.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }.nonEmpty
        if (hasWindow) plans.add("WINDOW_EXEC_SEEN")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val seeds = Seq(0L, 1L).toDF("id")
      graft.algos.NeighborSampling.run(g, seeds, Seq(3, 2), 42L).count()
      // listener callbacks are async; poll until they drain
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (plans.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      Thread.sleep(500) // allow stragglers
      val all = plans.toArray.map(_.toString)
      assert(all.nonEmpty)
      assert(!all.exists(_ == "WINDOW_EXEC_SEEN"), "window in sampling plan")
      assert(!all.exists(p => p.contains("collect_list") ||
        p.contains("collect_set")), "unbounded collect in sampling plan")
    } finally {
      spark.listenerManager.unregister(listener)
      g.unpersist()
    }
  }

  test("walk selection windows ride bucketed frames only") {
    // The two-level inversion bounds every window partition by
    // max(NBuckets, degree/NBuckets) rows; the pin is that EVERY
    // WindowExec in the selection plan reads a frame carrying the
    // bucket column (level 1: the per-bucket aggregate; level 2: the
    // picked-bucket join) — a window over the RAW candidate frame (the
    // round-3 implementation: one partition = a hub's whole adjacency)
    // has no `bkt` column and fails here.
    import spark.implicits._
    val weighted = Seq(
      (0L, 0L, 0L, 1L, 1.0, 1.0), (0L, 0L, 0L, 2L, 3.0, 3.0),
      (1L, 1L, 1L, 0L, 1.0, 1.0))
      .toDF("start", "prev", "vertex", "nbr", "ew", "wt")
    val picked = graft.algos.Node2Vec.selectNext(weighted, 1, 42L)
    graft.core.SparkTuning.withoutAqe(spark) {
      picked.count() // finalize executedPlan
      val windows = picked.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "no window in selection plan — changed?")
      windows.foreach { w =>
        assert(w.child.output.map(_.name).contains("bkt"),
          s"unbucketed walk window:\n$w")
      }
    }
  }

  test("pathOffsets windows ride the range-partition column, never global") {
    // The two-phase prefix sum must keep every window partitioned by
    // __pid (a range partition of bounded size); a window over the
    // whole frame (one task holds every path) has no __pid column.
    import spark.implicits._
    val sizes = (0L until 1000L).map(i => (i, i % 7 + 1)).toDF("path_id", "size")
    val out = graft.algos.RandomWalks.pathOffsets(sizes, numPartitions = 4)
    graft.core.SparkTuning.withoutAqe(spark) {
      out.count()
      val windows = out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      windows.foreach { w =>
        assert(w.child.output.map(_.name).contains("__pid"),
          s"global window in pathOffsets:\n$w")
      }
    }
  }

  test("fromDenseAdjacency explodes partition-locally: zero exchanges") {
    // The V^2 cell volume must exist only inside the scan stage — the
    // nonzero filter runs before any shuffle, so the edge list (not
    // the matrix) is what moves.
    import spark.implicits._
    val dense = Seq(
      (0L, Seq(0.0, 1.0, 2.0)),
      (1L, Seq(3.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 4.0))).toDF("id", "row")
    val g = LinkGraph.fromDenseAdjacency(dense, "id", "row")
    graft.core.SparkTuning.withoutAqe(spark) {
      g.edges.count()
      assert(exchanges(g.edges) == 0,
        g.edges.queryExecution.executedPlan.toString)
    }
  }

  test("core-number round body: one exchange for histogram+fold+update") {
    val g = cachedGraph()
    g.edges.count()
    val p = g.numPartitions
    val state = g.edges.select(col(SRC).as(ID)).distinct()
      .select(col(ID), lit(3L).as("c"))
      .repartition(p, col(ID))
    graft.core.SparkTuning.withoutAqe(spark) {
      val stream = g.edges
        .join(state.hint("shuffle_hash"), g.edges(SRC) === state(ID))
        .select(col(DST), col("c").as("v"))
      val byDst = stream.repartition(p, col(DST))
      val hist = byDst.groupBy(col(DST), col("v"))
        .agg(count(lit(1)).as("cnt"))
      val h = hist.groupBy(DST)
        .agg(max("v").as("h")) // stand-in fold; partitioning is the point
      val updated = state.join(h.hint("shuffle_hash"),
        state(ID) === h(DST), "left")
      updated.count()
      // one exchange from the repartition; state is pre-partitioned by
      // the session (repartition above executes as its own exchange
      // before the loop in the real algorithm)
      val n = exchanges(updated)
      assert(n <= 2, updated.queryExecution.executedPlan.toString)
    }
    g.unpersist()
  }

  test("sequence packing: the one window partitions by bucket, never global") {
    // concat-and-split's running sum is the intrinsic sequential pass;
    // it must stay sharded (partitionSpec = bucket) so per-task state
    // is corpus/buckets, and it must be the ONLY window.
    import spark.implicits._
    val d = (0L until 500L).map(i => (i, Seq.fill(5)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Packing.concatSplit(d, "doc_id", "text",
      buckets = 8, ctx = 16)
    graft.core.SparkTuning.withoutAqe(spark) {
      out.count()
      val windows = out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.length == 1,
        s"expected exactly one window:\n${out.queryExecution.executedPlan}")
      assert(windows.head.partitionSpec.nonEmpty &&
        windows.head.partitionSpec.exists(_.toString.contains("bucket")),
        s"global window in packing:\n${windows.head}")
    }
  }

  test("passage dedup executes no window: owner election is an aggregate") {
    import spark.implicits._
    val d = (0L until 200L)
      .map(i => (i, Seq.fill(50)(s"t${i % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.passageDedup(d, "doc_id", "text")
    graft.core.SparkTuning.withoutAqe(spark) {
      out.count()
      val windows = out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"window in passage dedup:\n${out.queryExecution.executedPlan}")
    }
  }
}
