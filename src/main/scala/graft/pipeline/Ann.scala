package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedMinK

/**
 * Similarity search over an embedding column (array<float>).
 *
 * Two paths:
 *   - [[cosineTopK]]: exact brute-force top-k — the correctness
 *     baseline. O(|Q|·N) similarity evaluations; fine when the query
 *     set is small or as the final re-rank stage.
 *   - [[lshCosineTopK]]: the scale path — signed-random-projection
 *     (hyperplane) LSH buckets candidates first, so the expensive
 *     cosine only runs inside buckets. Hyperplanes are a pure function
 *     of (seed, plane, dim) — no RNG state, reproducible on any
 *     cluster size.
 */
object Ann {

  /** Cosine similarity between two double-array columns (element count
   * must match). Computed as dot/(sqrt(na)*sqrt(nb)) over codegen'd
   * higher-order functions — no UDF. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /**
   * Exact top-k cosine neighbors for each query vector.
   * queries/corpus: (id, embedding). Returns
   * (query_id, neighbor_id, cos_micro, rank), rank 1..k, ties broken
   * by neighbor id ascending for determinism.
   */
  /** dot(a,b) via codegen'd higher-order functions. */
  private def dotCol(x: Column, y: Column): Column = aggregate(
    zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /**
   * Bounded top-k re-rank: (query_id, neighbor_id, cos_micro) →
   * (query_id, neighbor_id, cos_micro, rank 1..k) ordered by
   * (cos_micro desc, neighbor_id asc) per query.
   *
   * NOT a `row_number()` window: a window partitioned by query_id
   * sorts a query's ENTIRE candidate set in one task — at corpus
   * scale an IVF probe bucket or LSH bucket is a corpus fraction, so
   * that task is unbounded. The [[BoundedMinK]] pairs aggregator
   * keeps O(k) per group with map-side combine; the ordering key is
   * the zero-padded (1e6 − cos_micro) ∈ [0, 2e6] (7 digits, so
   * lexicographic == numeric) with neighbor_id as the ascending
   * tie-break — the exact order the oracles pin.
   */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val key = lpad((lit(1000000L) - col("cos_micro")).cast("string"), 7, "0")
    scored
      .groupBy("query_id")
      .agg(BoundedMinK.smallestKPairs(k)(key, col("neighbor_id"))
        .as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "kv")))
      .select(col("query_id"), col("kv.v").as("neighbor_id"),
        (lit(1000000L) - col("kv.key").cast("long")).as("cos_micro"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  def cosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int,
      maxQueries: Long = 10000L): DataFrame = {
    // Guard the O(|Q|·N) blow-up: this is the exact re-rank baseline,
    // not the scale path. A bounded limit-probe (early-exit scan, no
    // full count) refuses oversized query sets; callers that really
    // mean it pass maxQueries <= 0, everyone else gets pointed at
    // lshCosineTopK before the cluster melts.
    if (maxQueries > 0) {
      val probe = queries.limit((maxQueries + 1).toInt).count()
      require(probe <= maxQueries,
        s"cosineTopK is the exact O(|Q|*N) baseline and the query set " +
          s"exceeds $maxQueries rows; use lshCosineTopK for large query " +
          s"sets, or pass maxQueries <= 0 to override")
    }
    // Norms precomputed per side: the pairwise stage then does ONE dot
    // product per pair instead of three.
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(embCol)).as("qe"))
      .withColumn("qn", sqrt(dotCol(col("qe"), col("qe"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(embCol)).as("ce"))
      .withColumn("cn", sqrt(dotCol(col("ce"), col("ce"))))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dotCol(col("qe"), col("ce")) / (col("qn") * col("cn")) * 1e6, 0)
          .cast("long").as("cos_micro"))
    topKPerQuery(scored, k)
  }

  /** Deterministic hyperplane component for (seed, plane, dim) ∈ {-1,+1}.
   * Sign-random-projection only needs signs, so ±1 hyperplanes are
   * standard and keep the bucket key computation integer-only. The
   * sign is the parity of the first md5 byte of "seed:plane:dim" —
   * md5 so the DuckDB oracle reproduces the planes bit-for-bit
   * (evaluated once per (plane, dim) at plan-build time, never per row). */
  private def planeSign(seed: Long, plane: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$seed:$plane:$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) -1.0 else 1.0
  }

  /**
   * LSH-bucketed approximate top-k: `tables` independent hash tables of
   * `planes` hyperplanes each; candidates = vectors sharing a bucket in
   * ANY table; exact cosine re-rank inside candidates. Recall grows
   * with `tables`, bucket size shrinks with `planes`.
   */
  def lshCosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int,
      seed: Long = 42L, tables: Int = 4, planes: Int = 8,
      dim: Int = 64): DataFrame = {

    // Projection via zip_with + aggregate over a LITERAL sign array —
    // same left-to-right float sum as an unrolled term chain, but the
    // expression tree stays O(planes) instead of O(planes·dim): the
    // unrolled form produced a ~2000-node tree per table whose janino
    // compile dominated the query time.
    def bucketKey(e: Column, table: Int): Column =
      (0 until planes).map { p =>
        val signs = typedLit(
          (0 until dim).map(d => planeSign(seed, table * planes + p, d)))
        val proj = aggregate(
          zip_with(e, signs, (x, s) => x * s), lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(embCol)).as("ce"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(embCol)).as("qe"))

    val cBuckets = (0 until tables).map { t =>
      c.select(col("neighbor_id"), col("ce"), lit(t).as("tbl"),
        bucketKey(col("ce"), t).as("bkt"))
    }.reduce(_ union _)
    val qBuckets = (0 until tables).map { t =>
      q.select(col("query_id"), col("qe"), lit(t).as("tbl"),
        bucketKey(col("qe"), t).as("bkt"))
    }.reduce(_ union _)

    val candidates = qBuckets.join(cBuckets, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qe", "neighbor_id", "ce")
      .distinct()

    topKPerQuery(
      candidates.select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("ce")) * 1e6, 0).cast("long")
          .as("cos_micro")),
      k)
  }

  /**
   * IVF-flat approximate top-k — the inverted-file counterpart to
   * [[lshCosineTopK]]: a coarse quantizer of `nCentroids` sampled
   * corpus vectors partitions the corpus into buckets (each vector
   * joins its nearest centroid); a query probes its `probes` nearest
   * centroids and re-ranks exactly inside those buckets only.
   *
   * Determinism (and SQL reproducibility): centroids are the
   * `nCentroids` corpus vectors with the smallest md5(seed:id) — the
   * counter-hash sampling pattern — rather than Lloyd-refined means
   * (a k-means refinement would converge differently across float
   * summation orders). Assignment and probe selection compare
   * MICRO-ROUNDED cosines with centroid-id tie-breaks, so bucket
   * membership is bit-stable across engines.
   *
   * Scale: the quantizer is O(nCentroids) rows (broadcast); the
   * assignment is one broadcast-join pass over the corpus with a
   * struct-max aggregation (map-side combinable); the probe join
   * touches ~probes/nCentroids of the corpus per query.
   */
  /** Quantizer auto-size ceiling: centroids are broadcast (O(nc·dim)
   * doubles), so the √N default saturates here (~64Ki centroids ≈
   * 32 MB at dim 64, reached at N ≈ 4·10⁹ corpus vectors). */
  val MaxAutoCentroids = 1 << 16

  def ivfCosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int,
      // <= 0 (the default) auto-sizes the quantizer to ~√N from one
      // cheap corpus count — the fixed nCentroids=16 default made a
      // probe bucket a constant fraction (probes/16) of the corpus,
      // catastrophically coarse at 10⁹ docs (VERDICT r5 #2). Callers
      // that pin nCentroids (the driver fixture does) are unchanged.
      nCentroids: Int = 0, probes: Int = 2,
      seed: Long = 42L): DataFrame = {
    require(probes >= 1)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(embCol)).as("ce"))
    val nc =
      if (nCentroids >= 1) nCentroids
      else math.max(probes, math.min(MaxAutoCentroids,
        math.ceil(math.sqrt(c.count().toDouble)).toInt.max(1)))
    require(probes <= nc,
      s"probes=$probes exceeds nCentroids=$nc")
    val centroids = c
      .withColumn("__h", md5(concat_ws(":", lit(seed), col("neighbor_id"))))
      .orderBy(col("__h"), col("neighbor_id")).limit(nc)
      .select(col("neighbor_id").as("centroid_id"), col("ce").as("centroid"))

    def cm(e: Column): Column =
      round(cosine(e, col("centroid")) * 1e6, 0).cast("long")

    // Nearest centroid per corpus vector: struct-max on the unique
    // (cos_micro, -centroid_id) key.
    val assign = c.crossJoin(broadcast(centroids))
      .select(col("neighbor_id"),
        struct(cm(col("ce")).as("cm"),
          (-col("centroid_id")).as("nc")).as("key"))
      .groupBy("neighbor_id")
      .agg(max("key").as("pick"))
      .select(col("neighbor_id"), (-col("pick.nc")).as("centroid_id"))

    // Probe set per query: `probes` nearest centroids. Bounded min-k
    // (not a window) for plan uniformity with the re-rank — the group
    // is nCentroids-bounded either way, but this keeps the whole ANN
    // path window-free (asserted by AnnPlanShapeSpec).
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(embCol)).as("qe"))
    val probeKey = lpad((lit(1000000L) - col("cm")).cast("string"), 7, "0")
    val qProbes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qe"), col("centroid_id"),
        cm(col("qe")).as("cm"))
      .groupBy("query_id")
      .agg(first("qe").as("qe"),
        BoundedMinK.smallestKPairs(probes)(probeKey, col("centroid_id"))
          .as("pk"))
      .select(col("query_id"), col("qe"),
        explode(col("pk").getField("v")).as("centroid_id"))

    val candidates = qProbes
      .join(assign, Seq("centroid_id"))
      .join(c, Seq("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))

    topKPerQuery(
      candidates.select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("ce")) * 1e6, 0).cast("long")
          .as("cos_micro")),
      k)
  }

  /** Near-duplicate pairs by cosine threshold within a blocking column.
   *
   * Degenerate-block guard (on by DEFAULT — VERDICT r5 #6, the FA2
   * occupancy-guard philosophy): blocks holding at most `maxBlockRows`
   * vectors are compared EXACTLY (all pairs — bit-identical to the
   * unguarded plan); a mega-block past the bound is additionally
   * sub-bucketed by ⌈log₂(cnt/maxBlockRows)⌉ hyperplane sign bits of
   * its vectors (the [[lshCosineTopK]] scheme, capped at 16 bits), so
   * its join fanout stays ~maxBlockRows² per bucket instead of cnt² —
   * at the standard LSH recall cost WITHIN that block only (raise
   * recall by unioning several `seed`s). Pass `subPlanes > 0` to
   * force that many sub-bucket bits on EVERY block (the previous
   * explicit behavior), or `maxBlockRows <= 0` to disable the guard
   * outright (exact everywhere, unbounded fanout). */
  def nearDupPairs(
      emb: DataFrame, idCol: String, embCol: String, blockCol: String,
      thresholdMicro: Long,
      subPlanes: Int = 0, dim: Int = 64, seed: Long = 42L,
      maxBlockRows: Long = 8192L): DataFrame = {
    val e = emb.select(col(idCol), asDouble(col(embCol)).as("e"), col(blockCol))
      .withColumn("n", sqrt(dotCol(col("e"), col("e"))))

    // Sign bits for up to `nBits` hyperplanes — zip_with over literal
    // sign arrays (the element_at term chain made janino compile time
    // the bottleneck at O(planes·dim) tree nodes; the fold is the
    // identical left-to-right float sum).
    def signBits(nBits: Int): Column =
      (0 until nBits).map { p =>
        val signs = typedLit((0 until dim).map(d => planeSign(seed, p, d)))
        val proj = aggregate(
          zip_with(col("e"), signs, (x, s) => x * s),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val keyed =
      if (subPlanes > 0) e.withColumn("sub", signBits(subPlanes))
      else if (maxBlockRows <= 0) e.withColumn("sub", lit(0L))
      else {
        // Per-block occupancy decides how many of the (precomputed)
        // 16 sign bits apply: 0 below the bound (sub = 0 — the exact
        // plan), ⌈log₂(cnt/bound)⌉ above it.
        val bc = e.groupBy(col(blockCol)).agg(count(lit(1)).as("__bcnt"))
        val bits = when(col("__bcnt") <= maxBlockRows, lit(0))
          .otherwise(least(lit(16),
            ceil(log(2.0, col("__bcnt").cast("double") / maxBlockRows))
              .cast("int")))
        e.join(bc, Seq(blockCol))
          .withColumn("__bits", bits)
          .withColumn("sub",
            when(col("__bits") === 0, lit(0L)).otherwise(
              signBits(16).bitwiseAND(
                expr("shiftleft(1L, __bits) - 1L"))))
          .drop("__bcnt", "__bits")
      }
    val l = keyed.select(col(idCol).as("a"), col("e").as("ea"),
      col("n").as("na"), col(blockCol), col("sub"))
    val r = keyed.select(col(idCol).as("b"), col("e").as("eb"),
      col("n").as("nb"), col(blockCol), col("sub"))
    l.join(r, Seq(blockCol, "sub"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dotCol(col("ea"), col("eb")) / (col("na") * col("nb")) * 1e6, 0)
          .cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= thresholdMicro)
  }
}
