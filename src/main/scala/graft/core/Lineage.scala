package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.SqlInternals
import org.apache.spark.storage.StorageLevel

/**
 * Lineage control for iterative algorithms.
 *
 * An iterative superstep whose new state references the old state more
 * than once (e.g. once through the message join and once for the delta
 * computation) grows an exponentially-sized logical plan TREE even when
 * every step is persisted — Catalyst plans are trees, not DAGs. The
 * reference never faces this (its iteration state is device arrays,
 * `pagerank_impl.cuh:205`); on Spark we cut the plan every superstep.
 *
 * [[Lineage.materialize]] computes the frame once, caches the rows, and
 * returns a new frame whose logical plan is a flat LogicalRDD that
 * PRESERVES the physical output partitioning and ordering of the input
 * (so co-partitioned superstep joins stay exchange-free), plus a handle
 * to release the cache. Same pattern as Spark's own
 * `Dataset.localCheckpoint`, but with explicit unpersist control.
 */
object Lineage {

  private val debug = sys.env.contains("SPARK_GRAFT_LINEAGE_DEBUG")

  final case class Handle(df: DataFrame, private val rdd: RDD[InternalRow]) {
    def release(): Unit = {
      if (debug) {
        val at = Thread.currentThread.getStackTrace
          .drop(2).find(_.getClassName.startsWith("graft"))
        println(s"[lineage] release rdd=${rdd.id} at $at")
      }
      rdd.unpersist(blocking = false); ()
    }
  }

  /** Compute + cache `df`; return a plan-truncated equivalent. With
   * `eager = false` the first downstream action (e.g. the superstep's
   * scalar agg) materializes the cache, saving one job per iteration. */
  def materialize(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      eager: Boolean = true): Handle = {
    val (out, rdd) = SqlInternals.truncate(df, level, eager)
    if (debug) {
      val at = Thread.currentThread.getStackTrace
        .drop(2).find(_.getClassName.startsWith("graft"))
      println(s"[lineage] materialize rdd=${rdd.id} eager=$eager at $at")
    }
    Handle(out, rdd)
  }
}
