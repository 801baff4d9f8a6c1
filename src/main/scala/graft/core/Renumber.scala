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

  // ------------------------------------------------------------------
  // Multi-column external keys — the reference's NumberMap accepts
  // composite vertex identifiers (e.g. (host, path)) and renumbers the
  // tuple (`/root/reference/python/cugraph/cugraph/structure/number_map.py:327-500`).
  // `srcCols`/`dstCols` pair positionally; the map carries the key
  // under the SRC-side names plus (id, degree). Ids are dense 0..V-1,
  // degree-descending, ties broken by the key columns ascending (a
  // total order, so the assignment is deterministic).
  // ------------------------------------------------------------------

  /** (srcCols…, id, degree) map from a composite-key edge table. */
  def buildMapMulti(
      edgeKeys: DataFrame,
      srcCols: Seq[String],
      dstCols: Seq[String],
      numPartitions: Int): DataFrame = {
    require(srcCols.nonEmpty && srcCols.length == dstCols.length,
      s"src/dst key column lists must pair up, got $srcCols vs $dstCols")
    val occ = edgeKeys.select(srcCols.map(col): _*)
      .unionByName(edgeKeys.select(
        dstCols.zip(srcCols).map { case (d, s) => col(d).as(s) }: _*))
    val deg = occ.groupBy(srcCols.map(col): _*)
      .agg(count(lit(1)).as("degree"))
    DenseRank.assign(deg,
      col("degree").desc +: srcCols.map(col(_).asc), numPartitions)
  }

  /** Translate a composite-key edge table through the map →
   * (src, dst, weight). */
  def encodeMulti(
      edgeKeys: DataFrame,
      keyMap: DataFrame,
      srcCols: Seq[String],
      dstCols: Seq[String],
      weight: Double = 1.0): DataFrame = {
    val mSrc = keyMap.select(
      srcCols.map(col) :+ col(ID).as(SRC): _*)
    val mDst = keyMap.select(
      srcCols.zip(dstCols).map { case (s, d) => col(s).as(d) } :+
        col(ID).as(DST): _*)
    edgeKeys
      .join(mSrc, srcCols)
      .join(mDst, dstCols)
      .select(col(SRC), col(DST), lit(weight).as(WEIGHT))
  }

  /** Reverse translation: attach the composite key columns to a
   * per-vertex result frame. */
  def decodeMulti(
      result: DataFrame, keyMap: DataFrame, keyCols: Seq[String]): DataFrame =
    result.join(keyMap.select(col(ID) +: keyCols.map(col): _*), Seq(ID))
}
