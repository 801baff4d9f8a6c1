package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Lineage, LinkGraph}
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * Minimum spanning forest — BORŮVKA rounds (reference
 * `minimum_spanning_tree`, `/root/reference/cpp/include/cugraph/algorithms.hpp:743`,
 * legacy impl `cpp/src/tree/legacy/mst.cu`, which runs the same
 * data-parallel Borůvka shape on device).
 *
 * Per round, over canonical undirected edges (src < dst):
 *   1. annotate each edge with its endpoints' component labels; keep
 *      CROSS-component edges;
 *   2. per component, pick the minimum cross edge by the UNIQUE key
 *      (weight, src, dst) — a struct-min aggregation, map-side
 *      combinable (ties are impossible under the lexicographic key, so
 *      the pick — and therefore the whole forest — is deterministic:
 *      it is exactly the unique MST of the perturbed total order,
 *      which any algorithm using the same key agrees on; the SQL
 *      oracle and the host Kruskal spec both do);
 *   3. add the distinct picked edges to the forest; merge components
 *      by running min-label connected components over the picked
 *      COMPONENT-pair graph (nodes = current components — a frame that
 *      at least halves every round) and relabeling vertex components
 *      through the merge map.
 *
 * Rounds are O(log V) (components at least halve). Each round is two
 * co-keyed label joins + one struct-min aggregation + a WCC on the
 * shrinking component graph — no windows, no arrays.
 *
 * Returns the forest's canonical edges (src, dst, weight).
 */
object Mst {

  /** Rounds taken by the most recent [[forest]] call (oracle sizing). */
  @volatile var lastRounds: Int = 0

  def forest(g0: LinkGraph, maxIter: Int = 64): DataFrame =
    graft.core.SparkTuning.withoutAqe(g0.spark)(runImpl(g0, maxIter))

  /** MAXIMUM spanning forest — the reference's wrapper negates the
   * weights around the minimum call and negates them back
   * (`python/cugraph/cugraph/tree/minimum_spanning_tree.py:44-52`);
   * the (−w, src, dst) pick key keeps the forest unique. */
  def maximumForest(g0: LinkGraph, maxIter: Int = 64): DataFrame = {
    val neg = g0.copy(edges = g0.edges.select(
      col(SRC), col(DST), (-col(WEIGHT)).as(WEIGHT)))
    forest(neg, maxIter)
      .select(col(SRC), col(DST), (-col(WEIGHT)).as(WEIGHT))
  }

  private def runImpl(g0: LinkGraph, maxIter: Int): DataFrame = {
    val p = g0.numPartitions
    val spark = g0.spark

    val canon = Lineage.materialize(
      g0.edges.filter(col(SRC) =!= col(DST))
        .select(least(col(SRC), col(DST)).as(SRC),
          greatest(col(SRC), col(DST)).as(DST), col(WEIGHT))
        .groupBy(SRC, DST).agg(min(WEIGHT).as(WEIGHT))
        .repartition(p, col(SRC)),
      eager = false)

    // comp(v): component label, canonical = min member id.
    var comp = Lineage.materialize(
      canon.df.select(col(SRC).as(ID))
        .union(canon.df.select(col(DST).as(ID))).distinct()
        .select(col(ID), col(ID).as("comp"))
        .repartition(p, col(ID)),
      eager = false)

    var mst: Option[Lineage.Handle] = None
    var it = 0
    var crossCnt = 1L

    while (crossCnt > 0 && it < maxIter) {
      it += 1
      val cross = canon.df
        .join(comp.df.select(col(ID).as(SRC), col("comp").as("cs")), Seq(SRC))
        .join(comp.df.select(col(ID).as(DST), col("comp").as("cd")), Seq(DST))
        .filter(col("cs") =!= col("cd"))
      val crossH = Lineage.materialize(cross, eager = false)
      crossCnt = crossH.df.count()
      if (crossCnt > 0) {
        // Per-component minimum cross edge by (weight, src, dst).
        val key = struct(col(WEIGHT).as("w"), col(SRC).as("s"),
          col(DST).as("d"))
        val picks = crossH.df
          .select(col("cs").as("c"), key.as("k"))
          .union(crossH.df.select(col("cd").as("c"), key.as("k")))
          .groupBy("c").agg(min("k").as("k"))
          .select(col("k.s").as(SRC), col("k.d").as(DST),
            col("k.w").as(WEIGHT))
          .distinct()
        val picksH = Lineage.materialize(picks)
        // Merge components over the picked COMPONENT pairs.
        val pickPairs = picksH.df
          .join(comp.df.select(col(ID).as(SRC), col("comp").as("cs")),
            Seq(SRC))
          .join(comp.df.select(col(ID).as(DST), col("comp").as("cd")),
            Seq(DST))
          .select(col("cs").as(SRC), col("cd").as(DST))
        val compGraph = LinkGraph(
          LinkGraph.partitioned(
            pickPairs.union(
                pickPairs.select(col(DST).as(SRC), col(SRC).as(DST)))
              .distinct()
              .withColumn(WEIGHT, lit(1.0)),
            p),
          directed = false, p)
        val merged = ConnectedComponents.run(compGraph).components
          .select(col(ID).as("comp"), col("component").as("newc"))
        val newComp = Lineage.materialize(
          comp.df.join(merged.hint("shuffle_hash"), Seq("comp"), "left")
            .select(col(ID),
              coalesce(col("newc"), col("comp")).as("comp"))
            .repartition(p, col(ID)))
        val newMst = Lineage.materialize(
          mst.map(_.df.union(picksH.df)).getOrElse(picksH.df))
        mst.foreach(_.release())
        mst = Some(newMst)
        picksH.release()
        comp.release()
        comp = newComp
      }
      crossH.release()
    }
    lastRounds = it
    comp.release()
    canon.release()
    val out = mst.map { h =>
      val o = Lineage.materialize(h.df.select(SRC, DST, WEIGHT))
      h.release()
      o.df
    }.getOrElse {
      import spark.implicits._
      spark.emptyDataset[(Long, Long, Double)].toDF(SRC, DST, WEIGHT)
    }
    out
  }
}
