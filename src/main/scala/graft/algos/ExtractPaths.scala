package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Lineage
import graft.core.LinkGraph.ID

/**
 * Path reconstruction from a traversal's predecessor tree — the
 * reference's `extract_bfs_paths`
 * (`/root/reference/cpp/include/cugraph/algorithms.hpp:1063`, impl
 * `cpp/src/traversal/extract_bfs_paths_impl.cuh`): given the
 * (id, distance, predecessor) frame a [[Bfs]]/[[Sssp]] run returns and
 * a set of destination vertices, emit each destination's root→dst
 * path.
 *
 * Iterative backtrack: every destination walks one predecessor hop
 * per superstep — a co-keyed join of the walker frame against the
 * predecessor table (only the walker frame shuffles; its width is
 * |destinations|, not |V|). Supersteps = max distance over the
 * destinations; the reference's kernel does the same per-thread hop
 * chase on device.
 *
 * Returns (destination, pos, vertex) rows, pos 0 = the root — the
 * exploded form keeps the result SQL-comparable and avoids arrays.
 * Destinations absent from `traversal` (unreached) produce no rows,
 * like the reference's invalid-vertex sentinels.
 */
object ExtractPaths {

  def fromPredecessors(
      traversal: DataFrame, // (id, distance, predecessor)
      destinations: DataFrame): DataFrame = {
    val pred = traversal.select(col(ID), col("distance"),
      col("predecessor"))
    val dests = destinations
      .select(col(destinations.columns.head).as("destination")).distinct()

    // Walker state: (destination, vertex at current backtrack hop,
    // pos = distance of that vertex). Start at the destination itself.
    var cur = Lineage.materialize(
      dests.join(pred, dests("destination") === pred(ID))
        .select(col("destination"), col(ID).as("vertex"),
          col("distance").cast("long").as("pos"),
          col("predecessor")),
      eager = false)
    var out = cur.df.select("destination", "pos", "vertex")
    val scratch = scala.collection.mutable.ArrayBuffer[Lineage.Handle](cur)

    // Safety bound: a CONSISTENT predecessor tree strictly decreases
    // pos every hop, so maxPos hops always suffice; corrupt input
    // (e.g. a predecessor cycle from a hand-edited frame) terminates
    // with an error instead of looping forever.
    val maxHops = {
      val r = cur.df.agg(max("pos")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var hops = 0L
    var active = cur.df.filter(col("pos") > 0).count()
    while (active > 0) {
      hops += 1
      require(hops <= maxHops + 1,
        s"predecessor frame is not a tree (cycle detected after $hops hops)")
      val next = Lineage.materialize(
        cur.df.filter(col("pos") > 0)
          .select(col("destination"), col("predecessor").as("vertex"))
          .join(pred, col("vertex") === pred(ID))
          .select(col("destination"), col("vertex"),
            col("distance").cast("long").as("pos"), col("predecessor")),
        eager = false)
      scratch += next
      out = out.union(next.df.select("destination", "pos", "vertex"))
      active = next.df.filter(col("pos") > 0).count()
      cur = next
    }

    val result = Lineage.materialize(out)
    scratch.foreach(_.release())
    result.df
  }
}
