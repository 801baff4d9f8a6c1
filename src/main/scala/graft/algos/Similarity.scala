package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.core.LinkGraph.{DST, ID, SRC}

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
 * supported by passing explicit pairs). Plan: one adjacency-array
 * build (sorted collect_set) + two co-keyed joins + array_intersect.
 */
object Similarity {

  sealed trait Coefficient { def name: String }
  case object Jaccard extends Coefficient { val name = "jaccard" }
  case object Sorensen extends Coefficient { val name = "sorensen" }
  case object Overlap extends Coefficient { val name = "overlap" }

  /** Returns (src, dst, <coef> as double). */
  def run(
      g: LinkGraph,
      coefficient: Coefficient,
      pairs: Option[DataFrame] = None): DataFrame = {
    val adj = g.edges.filter(col(SRC) =!= col(DST))
      .groupBy(col(SRC).as(ID))
      .agg(sort_array(collect_set(col(DST))).as("nbrs"),
        count(lit(1)).as("deg"))
    val pr = pairs.getOrElse(
      g.edges.filter(col(SRC) < col(DST)).select(SRC, DST).distinct())
    val aU = adj.select(col(ID).as(SRC), col("nbrs").as("na"), col("deg").as("da"))
    val aV = adj.select(col(ID).as(DST), col("nbrs").as("nb"), col("deg").as("db"))
    val base = pr.join(aU, Seq(SRC)).join(aV, Seq(DST))
      .select(col(SRC), col(DST),
        size(array_intersect(col("na"), col("nb"))).cast("double").as("i"),
        col("da").cast("double").as("da"), col("db").cast("double").as("db"))
    val score = coefficient match {
      case Jaccard => col("i") / (col("da") + col("db") - col("i"))
      case Sorensen => lit(2.0) * col("i") / (col("da") + col("db"))
      case Overlap => col("i") / least(col("da"), col("db"))
    }
    base.select(col(SRC), col(DST), score.as(coefficient.name))
  }
}
