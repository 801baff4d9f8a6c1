package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * Spectral balanced-cut bipartition (reference
 * `/root/reference/cpp/include/cugraph/algorithms.hpp:818-849`
 * spectral*Clustering, legacy impl
 * `cpp/src/community/legacy/spectral_clustering.cu`): the k = 2
 * instance — split by the sign of the FIEDLER VECTOR (second-smallest
 * eigenvector of the graph Laplacian L = D − W), the canonical
 * spectral cut. The reference runs a Lanczos eigensolver; the
 * Spark-native equivalent is DEFLATED POWER ITERATION on the spectral
 * shift σI − L (σ = 2·max weighted degree ≥ λmax by Gershgorin):
 *
 *   y(v) = (σ − d(v))·x(v) + Σ_u w(v,u)·x(u)   — one superstep join
 *   x'   = (y − mean(y)) / ‖y − mean(y)‖₂      — deflates the trivial
 *                                                constant eigenvector
 *
 * which converges to the eigenvector of σ − λ₂, i.e. the Fiedler
 * vector. Each iteration is the PageRank superstep shape: one
 * co-partitioned state⋈edges join, one message reduce (the only
 * E-sized shuffle, map-side combined) plus two scalar aggregates.
 *
 * Determinism: x₀(v) = md5-hash(seed:v) mapped to [−0.5, 0.5) — a
 * splittable counter init, identical on any partitioning and
 * reproducible in SQL. Fixed `iterations` (no convergence test) keeps
 * the computation bit-comparable against the recursive-CTE oracle up
 * to last-ulp float noise, absorbed by micro rounding.
 *
 * Expects an undirected (symmetrized, deduped) graph.
 * Returns (id, fiedler_micro, cluster ∈ {0, 1}).
 */
object Spectral {

  final case class Config(iterations: Int = 20, seed: Long = 42L)

  def fiedlerCut(g0: LinkGraph, cfg: Config = Config()): DataFrame =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, cfg))

  private def runImpl(g0: LinkGraph, cfg: Config): DataFrame = {
    val callerCached = g0.edges.storageLevel != StorageLevel.NONE
    val g = if (callerCached) g0 else g0.cached()
    val p = g.numPartitions
    val edges = g.edges

    // Weighted degrees; undirected input => every vertex appears as src.
    val deg = Lineage.materialize(
      edges.groupBy(col(SRC).as(ID)).agg(sum(WEIGHT).as("d"))
        .repartition(p, col(ID)),
      eager = false)
    val sigma = 2.0 * deg.df.agg(max("d")).head().getDouble(0)

    // x0: md5 counter hash -> [-0.5, 0.5)
    val h01 = pmod(conv(substring(
      md5(concat_ws(":", lit(cfg.seed), col(ID))), 1, 8), 16, 10)
      .cast("long"), lit(1000000L)) / 1000000.0
    var x = Lineage.materialize(
      deg.df.select(col(ID), col("d"), (h01 - 0.5).as("x")), eager = false)

    for (_ <- 1 to cfg.iterations) {
      val msgs = edges
        .join(x.df.select(col(ID), col("x")).hint("shuffle_hash"),
          edges(SRC) === col(ID))
        .select(col(DST), (col(WEIGHT) * col("x")).as("m"))
        .groupBy(DST).agg(sum("m").as("m"))
      val y = x.df.join(msgs.hint("shuffle_hash"),
          x.df(ID) === msgs(DST), "left")
        .select(x.df(ID), x.df("d"),
          ((lit(sigma) - col("d")) * col("x")
            + coalesce(col("m"), lit(0.0))).as("y"))
      val yH = Lineage.materialize(y, eager = false)
      // One scalar pass: mu and the centered norm via
      // ||y - mu||^2 = sum(y^2) - n*mu^2 (the oracle mirrors this
      // exact algebraic form, so both engines share the same float
      // path up to sum-order noise absorbed by micro rounding).
      val stats = yH.df
        .agg(avg("y"), count(lit(1)), sum(col("y") * col("y"))).head()
      val mu = stats.getDouble(0)
      val norm = math.sqrt(stats.getDouble(2) - stats.getLong(1) * mu * mu)
      val next = Lineage.materialize(
        yH.df.select(col(ID), col("d"),
          ((col("y") - mu) / norm).as("x")),
        eager = false)
      next.df.count() // materialize before releasing parents
      yH.release()
      x.release()
      x = next
    }

    val out = Lineage.materialize(
      x.df.select(col(ID),
        round(col("x") * 1e6, 0).cast("long").as("fiedler_micro"),
        when(col("x") > 0, 1L).otherwise(0L).as("cluster")))
    x.release()
    deg.release()
    if (!callerCached) g.unpersist()
    out.df
  }
}
