package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC}

/**
 * Uniform random walks (reference contract
 * `/root/reference/cpp/include/cugraph/algorithms.hpp:1348`,
 * `cpp/src/sampling/random_walks_impl.cuh`): one fixed-length walk per
 * start vertex; at each step the walker moves to a uniformly-chosen
 * out-neighbor; a walk ends early at a sink.
 *
 * Determinism: the reference uses device RNG; we pin a SPLITTABLE
 * deterministic choice — neighbor index = md5(seed:start:step) mod
 * out-degree over the SORTED neighbor list — so results are identical
 * across partitionings/cluster sizes AND reproducible by the SQL
 * oracle (md5 is engine-independent). Statistically this is a fixed
 * hash stream per (walk, step), the standard counter-based RNG idea.
 *
 * Returns (start, step, vertex): step 0 is the start vertex itself.
 */
object RandomWalks {

  final case class Config(length: Int = 4, seed: Long = 42L)

  def run(g0: LinkGraph, starts: DataFrame, cfg: Config = Config()): DataFrame =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, starts, cfg))

  private def runImpl(g0: LinkGraph, starts: DataFrame, cfg: Config): DataFrame = {
    val callerCached = g0.edges.storageLevel != StorageLevel.NONE
    val g = if (callerCached) g0 else g0.cached()
    val p = g.numPartitions

    // Sorted adjacency arrays: deterministic neighbor indexing.
    val adj = g.edges.select(SRC, DST).distinct()
      .groupBy(col(SRC).as("v"))
      .agg(sort_array(collect_list(col(DST))).as("nbrs"))
      .repartition(p, col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var cur = Lineage.materialize(
      starts.select(col(starts.columns.head).as("start"))
        .withColumn("step", lit(0L))
        .withColumn("vertex", col("start"))
        .repartition(p, col("vertex")),
      eager = false)
    val segments = scala.collection.mutable.ArrayBuffer[Lineage.Handle](cur)
    var out = cur.df

    for (step <- 1 to cfg.length) {
      // choice = md5("<seed>:<start>:<step>") as a 32-bit int, mod degree
      val h = conv(substring(
        md5(concat_ws(":", lit(cfg.seed), col("start"), lit(step))), 1, 8),
        16, 10).cast("long")
      val next = Lineage.materialize(
        cur.df.join(adj, cur.df("vertex") === adj("v")) // sinks drop out
          .select(col("start"), lit(step.toLong).as("step"),
            element_at(col("nbrs"),
              (pmod(h, size(col("nbrs"))) + 1).cast("int")).as("vertex"))
          .repartition(p, col("vertex")))
      segments += next
      out = out.union(next.df)
      cur = next
    }

    val result = Lineage.materialize(out)
    segments.foreach(_.release())
    adj.unpersist()
    if (!callerCached) g.unpersist()
    result.df
  }
}
