package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe dense id assignment: adds a 0-based `id` column numbering
 * rows in the total order given by `sortCols`, without ever collapsing
 * to a single partition (a bare `row_number() over (order by …)` is a
 * 1-partition bottleneck — wrong at 10^12 rows).
 *
 * Two-phase plan: range-repartition on the sort key, sort within
 * partitions, count rows per partition (tiny driver collect of
 * numPartitions longs), then per-partition row_number + broadcast
 * offset. Because `sortCols` must be a TOTAL order (callers append a
 * unique tie-break column), the assigned ids are independent of where
 * the range boundaries fall — deterministic across runs and cluster
 * sizes. This is our analog of the reference's dense degree-descending
 * renumbering (`/root/reference/cpp/src/structure/renumber_edgelist_impl.cuh:384-390`).
 */
object DenseRank {

  def assign(
      df: DataFrame,
      sortCols: Seq[Column],
      numPartitions: Int,
      idCol: String = "id"): DataFrame = {
    val sorted = Lineage.materialize(
      df.repartitionByRange(numPartitions, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))

    val counts = sorted.df.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    var acc = 0L
    val offsetRows = (0 to maxPid).map { pid =>
      val off = acc; acc += counts.getOrElse(pid, 0L); (pid, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(offsetRows.toDF("__pid", "__off"))

    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    sorted.df
      .join(offsets, Seq("__pid"), "left")
      .withColumn(idCol,
        row_number().over(w).cast("long") - 1L + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__off")
  }
}
