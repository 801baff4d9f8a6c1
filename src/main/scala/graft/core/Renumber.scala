package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}

/**
 * External vertex id (url string) ↔ dense internal Long id, the analog
 * of the reference's NumberMap / C++ renumbering
 * (`/root/reference/python/cugraph/cugraph/structure/number_map.py:327-687`,
 * `/root/reference/cpp/src/structure/renumber_edgelist_impl.cuh:94-452`).
 *
 * Ids are dense 0..V-1 assigned in DEGREE-DESCENDING order (reference
 * `renumber_edgelist_impl.cuh:384-390`), ties broken by url ascending
 * (the reference leaves tie order unspecified; we pin it so labels are
 * reproducible). Degree = total occurrence count of the url as src or
 * dst, duplicates included — computed in one pass before dedup, like
 * the reference's edgelist-major/minor counts.
 */
object Renumber {

  /** (url, id, degree) map from a (src_url, dst_url) edge table. */
  def buildMap(edgeUrls: DataFrame, numPartitions: Int): DataFrame = {
    val occ = edgeUrls.select(col("src_url").as("url"))
      .union(edgeUrls.select(col("dst_url").as("url")))
    val deg = occ.groupBy("url").agg(count(lit(1)).as("degree"))
    DenseRank.assign(deg, Seq(col("degree").desc, col("url").asc),
      numPartitions)
  }

  /** Translate a url edge table through the map → (src, dst, weight). */
  def encode(
      edgeUrls: DataFrame,
      urlMap: DataFrame,
      weight: Double = 1.0): DataFrame = {
    val mSrc = urlMap.select(col("url").as("src_url"), col(ID).as(SRC))
    val mDst = urlMap.select(col("url").as("dst_url"), col(ID).as(DST))
    edgeUrls
      .join(mSrc, Seq("src_url"))
      .join(mDst, Seq("dst_url"))
      .select(col(SRC), col(DST), lit(weight).as(WEIGHT))
  }

  /** Reverse translation: attach urls to a per-vertex result frame. */
  def decode(result: DataFrame, urlMap: DataFrame): DataFrame =
    result.join(urlMap.select(col(ID), col("url")), Seq(ID))
}
