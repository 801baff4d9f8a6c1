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
}
