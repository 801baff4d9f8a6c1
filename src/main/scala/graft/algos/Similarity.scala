package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * Link-prediction similarity coefficients over neighbor-set
 * intersections, the reference's jaccard / sorensen / overlap family
 * (`/root/reference/cpp/src/link_prediction/similarity_impl.cuh`,
 * contracts `/root/reference/cpp/include/cugraph/algorithms.hpp:1739-1795`):
 *
 *   jaccard  = |A ∩ B| / |A ∪ B|
 *   sorensen = 2|A ∩ B| / (|A| + |B|)
 *   overlap  = |A ∩ B| / min(|A|, |B|)
 *
 * Expects an undirected graph; pairs default to the graph's own edges
 * with src < dst (the reference's two-hop default pair set is also
 * supported by passing explicit pairs).
 *
 * Scale design: common neighbors are counted with a DISTRIBUTED
 * two-level join-aggregate — pair (a,b) joins a's edge rows, then the
 * (b, w) edge key closes the wedge — so no row ever holds a full
 * adjacency list (a mega-hub's neighborhood stays spread across
 * partitions; the old collect_set formulation put it in one row).
 * Both joins are equi-joins with map-side-combinable count
 * aggregation; degrees come from one groupBy over deduped edges, so
 * set cardinality and degree always agree even on multigraph input.
 */
object Similarity {

  sealed trait Coefficient { def name: String }
  case object Jaccard extends Coefficient { val name = "jaccard" }
  case object Sorensen extends Coefficient { val name = "sorensen" }
  case object Overlap extends Coefficient { val name = "overlap" }

  /** The intersection-statistics frame (src, dst, i, da, db) every
   * coefficient is a pure per-row formula over — the expensive wedge
   * join computed ONCE and shared by jaccard/sorensen/overlap (the
   * three run()s used to recompute it per metric). */
  def base(g: LinkGraph, pairs: Option[DataFrame] = None): DataFrame = {
    val edges = g.edges.filter(col(SRC) =!= col(DST))
      .select(SRC, DST).distinct()
    val deg = edges.groupBy(col(SRC).as(ID))
      .agg(count(lit(1)).cast("double").as("d"))
    val pr = pairs
      .map(_.select(col(SRC), col(DST)))
      .getOrElse(edges.filter(col(SRC) < col(DST)))

    // Wedge count: (a,b) -> |{w : a~w and b~w}| via two equi-joins.
    val n1 = edges.select(col(SRC), col(DST).as("w"))
    val n2 = edges.select(col(SRC).as(DST), col(DST).as("w"))
    val common = pr.join(n1, Seq(SRC)).join(n2, Seq(DST, "w"))
      .groupBy(SRC, DST).agg(count(lit(1)).cast("double").as("i"))

    pr
      .join(deg.select(col(ID).as(SRC), col("d").as("da")), Seq(SRC))
      .join(deg.select(col(ID).as(DST), col("d").as("db")), Seq(DST))
      .join(common, Seq(SRC, DST), "left")
      .select(col(SRC), col(DST),
        coalesce(col("i"), lit(0.0)).as("i"), col("da"), col("db"))
  }

  /** Apply one coefficient's formula to a [[base]] frame — identical
   * per-row float path as the fused run(). */
  def fromBase(base: DataFrame, coefficient: Coefficient): DataFrame = {
    val score = coefficient match {
      case Jaccard => col("i") / (col("da") + col("db") - col("i"))
      case Sorensen => lit(2.0) * col("i") / (col("da") + col("db"))
      case Overlap => col("i") / least(col("da"), col("db"))
    }
    base.select(col(SRC), col(DST), score.as(coefficient.name))
  }

  /** Returns (src, dst, <coef> as double). */
  def run(
      g: LinkGraph,
      coefficient: Coefficient,
      pairs: Option[DataFrame] = None): DataFrame =
    fromBase(base(g, pairs), coefficient)

  /**
   * WEIGHTED similarity variants (reference
   * `/root/reference/cpp/include/cugraph/algorithms.hpp:62-136`,
   * legacy `cpp/src/link_prediction/legacy/overlap.cu`): with a
   * per-vertex weight t(v),
   *
   *   wjaccard(a,b)  = W(A ∩ B) / (W(A) + W(B) - W(A ∩ B))
   *   wsorensen(a,b) = 2 W(A ∩ B) / (W(A) + W(B))
   *   woverlap(a,b)  = W(A ∩ B) / min(W(A), W(B))
   *
   * where W(S) = Σ_{v∈S} t(v). Same distributed wedge-join shape as
   * [[run]]; the intersection weight sums t(w) over shared neighbors.
   * `vertexWeights`: (id, vw).
   */
  def runWeighted(
      g: LinkGraph,
      coefficient: Coefficient,
      vertexWeights: DataFrame,
      pairs: Option[DataFrame] = None): DataFrame =
    fromBaseWeighted(baseWeighted(g, vertexWeights, pairs), coefficient)

  /** Weighted analog of [[base]]: (src, dst, i, da, db) with
   * i = W(A ∩ B), da/db = W(N(v)) — shared by the three weighted
   * coefficients. */
  def baseWeighted(
      g: LinkGraph,
      vertexWeights: DataFrame,
      pairs: Option[DataFrame] = None): DataFrame = {
    val vw = vertexWeights.select(col(ID), col("vw").cast("double"))
    val edges = g.edges.filter(col(SRC) =!= col(DST))
      .select(SRC, DST).distinct()
    // W(N(v)) per vertex: one co-keyed join + map-combinable sum.
    val nbrW = edges
      .join(vw.select(col(ID).as(DST), col("vw")), Seq(DST))
      .groupBy(col(SRC).as(ID)).agg(sum("vw").as("d"))
    val pr = pairs
      .map(_.select(col(SRC), col(DST)))
      .getOrElse(edges.filter(col(SRC) < col(DST)))

    val n1 = edges.select(col(SRC), col(DST).as("w"))
    val n2 = edges.select(col(SRC).as(DST), col(DST).as("w"))
    val common = pr.join(n1, Seq(SRC)).join(n2, Seq(DST, "w"))
      .join(vw.select(col(ID).as("w"), col("vw")), Seq("w"))
      .groupBy(SRC, DST).agg(sum("vw").as("i"))

    pr
      .join(nbrW.select(col(ID).as(SRC), col("d").as("da")), Seq(SRC))
      .join(nbrW.select(col(ID).as(DST), col("d").as("db")), Seq(DST))
      .join(common, Seq(SRC, DST), "left")
      .select(col(SRC), col(DST),
        coalesce(col("i"), lit(0.0)).as("i"), col("da"), col("db"))
  }

  /** Weighted formula over a [[baseWeighted]] frame (column name
   * prefixed "w", matching runWeighted). */
  def fromBaseWeighted(
      base: DataFrame, coefficient: Coefficient): DataFrame = {
    val score = coefficient match {
      case Jaccard => col("i") / (col("da") + col("db") - col("i"))
      case Sorensen => lit(2.0) * col("i") / (col("da") + col("db"))
      case Overlap => col("i") / least(col("da"), col("db"))
    }
    base.select(col(SRC), col(DST), score.as("w" + coefficient.name))
  }
}
