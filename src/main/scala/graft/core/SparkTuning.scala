package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Session tuning scoped to the iterative (Pregel-style) algorithms.
 *
 * AQE stays ON for ad-hoc analytical queries (skew joins, coalescing),
 * but is switched OFF inside the superstep loops: an AdaptiveSparkPlan
 * reports UnknownPartitioning until executed, so caching or
 * LogicalRDD-wrapping an AQE plan LOSES the hash-partitioning metadata
 * and every subsequent co-partitioned join re-shuffles the edge table —
 * the exact cost the layout exists to avoid. The superstep plans are
 * fixed-shape with known sizes; there is nothing for AQE to adapt, and
 * skew is already handled by partial aggregation in the message reduce.
 */
object SparkTuning {

  def withoutAqe[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /**
   * Run `f` with `spark.sql.shuffle.partitions` scoped to `n` —
   * scale-adaptive partitioning for an algorithm that has measured its
   * input and found it far smaller than the session layout (a 36-vertex
   * layout fixture on a 32-partition session spends its whole wall
   * clock scheduling empty tasks: every per-iteration aggregation is a
   * 32-task stage). Callers derive `n` from a row count, so the same
   * code keeps the full session parallelism on at-scale inputs. NOT
   * safe under driver-thread concurrency (the conf is session-global);
   * the callers are single-threaded algorithm loops.
   */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
