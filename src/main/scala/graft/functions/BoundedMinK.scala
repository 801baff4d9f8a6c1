package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (ordering key, payload) candidate for [[BoundedMinK]]. */
final case class KeyedValue(key: String, v: Long)

/**
 * Bounded min-k aggregation: the k smallest (key, v) pairs per group,
 * ordered by (key asc, v asc), returned as the payload values in that
 * order.
 *
 * This is the typed `Aggregator` SURVEY.md §2.i reserved for exactly
 * this case: Spark has no built-in bounded top-k aggregate, and the
 * two built-in routes are both wrong at scale — a window
 * `row_number() over (partition by src)` ranks a hub's ENTIRE
 * adjacency in one task (unbounded on a power-law graph), and
 * `slice(sort_array(collect_list(...)))` first materializes the full
 * list in one row. Here the buffer never exceeds k entries, partial
 * aggregation (map-side combine) applies, and merge is a bounded
 * sorted-merge — so a 10^8-degree hub costs each task O(fanout)
 * memory instead of O(degree).
 *
 * Used by [[graft.algos.NeighborSampling]] (reference fan-out
 * sampling, `/root/reference/cpp/src/sampling/uniform_neighbor_sampling_impl.hpp`),
 * where key = md5(seed:hop:src:dst) pins a deterministic uniform
 * without-replacement sample (v breaks the astronomically-unlikely
 * hash tie, mirroring the SQL oracle's ORDER BY md5(...), dst).
 */
final class BoundedMinK(k: Int)
    extends Aggregator[KeyedValue, Seq[KeyedValue], Seq[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def lt(a: KeyedValue, b: KeyedValue): Boolean =
    a.key < b.key || (a.key == b.key && a.v < b.v)

  override def zero: Seq[KeyedValue] = Vector.empty

  override def reduce(buf: Seq[KeyedValue], x: KeyedValue): Seq[KeyedValue] = {
    // buf is sorted; insert-in-place and drop the overflow.
    if (buf.size >= k && !lt(x, buf.last)) buf
    else {
      val i = buf.indexWhere(b => lt(x, b)) match {
        case -1 => buf.size
        case n => n
      }
      val inserted = (buf.take(i) :+ x) ++ buf.drop(i)
      if (inserted.size > k) inserted.take(k) else inserted
    }
  }

  override def merge(a: Seq[KeyedValue], b: Seq[KeyedValue]): Seq[KeyedValue] = {
    // Merge two sorted bounded buffers, keep the k smallest.
    val out = Vector.newBuilder[KeyedValue]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && lt(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[KeyedValue]): Seq[Long] = buf.map(_.v)

  override def bufferEncoder: Encoder[Seq[KeyedValue]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedValue]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/**
 * [[BoundedMinK]] variant that keeps the ordering keys in the output:
 * the k smallest (key, v) pairs per group as an array of structs in
 * (key asc, v asc) order. Used where the consumer needs BOTH the rank
 * (array position) and a value encoded in the key — e.g. the ANN
 * top-k re-rank, where key = zero-padded (1e6 − cos_micro) so array
 * order is (cos_micro desc, neighbor_id asc) and cos_micro is
 * recovered from the key. Same O(k)-per-group buffer and map-side
 * combine as the base aggregator.
 */
final class BoundedMinKPairs(k: Int)
    extends Aggregator[KeyedValue, Seq[KeyedValue], Seq[KeyedValue]] {
  private val inner = new BoundedMinK(k)
  override def zero: Seq[KeyedValue] = inner.zero
  override def reduce(b: Seq[KeyedValue], x: KeyedValue): Seq[KeyedValue] =
    inner.reduce(b, x)
  override def merge(a: Seq[KeyedValue], b: Seq[KeyedValue]): Seq[KeyedValue] =
    inner.merge(a, b)
  override def finish(buf: Seq[KeyedValue]): Seq[KeyedValue] = buf
  override def bufferEncoder: Encoder[Seq[KeyedValue]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedValue]]()
  override def outputEncoder: Encoder[Seq[KeyedValue]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedValue]]()
}

object BoundedMinK {
  /** Column function: smallestK(keyCol, valueCol) -> array<long> of the
   * payloads of the k smallest (key, value) pairs per group. */
  def smallestK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedMinK(k))

  /** Column function: smallestKPairs(keyCol, valueCol) ->
   * array<struct<key:string,v:long>> of the k smallest pairs per
   * group in (key asc, v asc) order. */
  def smallestKPairs(
      k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedMinKPairs(k))
}
