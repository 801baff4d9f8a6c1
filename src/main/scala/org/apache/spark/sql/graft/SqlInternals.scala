package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/**
 * The one spot where we touch Spark-internal (private[sql]) API, hence
 * the package placement. Used only to cut logical-plan lineage in
 * iterative algorithms while preserving output partitioning — the same
 * mechanism `Dataset.localCheckpoint` uses internally, with explicit
 * cache control.
 */
object SqlInternals {

  /** Compute `df` eagerly into a cached InternalRow RDD and wrap it in a
   * fresh flat plan that keeps the original output partitioning. */
  def truncate(
      df: DataFrame,
      level: StorageLevel,
      eager: Boolean): (DataFrame, RDD[InternalRow]) = {
    val cds = df.asInstanceOf[ClassicDataset[Row]]
    // toRdd reuses mutable rows; copy before caching. localCheckpoint
    // cuts the RDD DEPENDENCY chain at first materialization — without
    // it, iteration N's tasks serialize a lineage N levels deep and
    // long runs die with StackOverflowError during task serialization
    // (truncating the logical plan alone does not truncate RDD lineage).
    val rdd = cds.queryExecution.toRdd.map(_.copy()).persist(level)
    rdd.localCheckpoint()
    val logical = LogicalRDD.fromDataset(rdd, cds, isStreaming = false)
    val out = ClassicDataset.ofRows(cds.sparkSession, logical)
    if (eager) rdd.count() // else: the caller's first action materializes
    (out, rdd)
  }
}
