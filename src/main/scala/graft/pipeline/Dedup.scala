package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines.
 * All hash material is MD5 (same algorithm in Spark and DuckDB), so
 * every operator here has an engine-independent oracle; all shapes are
 * shuffle-lean: shingling explodes locally, signatures reduce with
 * map-side combine, and candidate generation joins only on
 * band-bucket keys (never all-pairs).
 */
object Dedup {

  /** Exact dedup: canonical_id = min doc id sharing the same text hash.
   * One groupBy + one co-keyed join; at 100 TB this is the cheapest
   * possible exact pass (hash-shuffle on a 32-byte key). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = docs.select(col(idCol), md5(col(textCol)).as("__h"))
    val canon = h.groupBy("__h").agg(min(col(idCol)).as("canonical_id"))
    h.join(canon, Seq("__h"))
      .select(col(idCol), col("canonical_id"))
  }

  /** Character shingles (length `n`, stride `stride`), 1-based starts —
   * identical to `substr(text, i, n)` over
   * `generate_series(1, greatest(len-n+1, 1), stride)` in SQL. */
  def shingles(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, stride: Int = 4): DataFrame =
    docs.select(col(idCol),
        explode(sequence(lit(1),
          greatest(length(col(textCol)) - (n - 1), lit(1)),
          lit(stride))).as("__i"),
        col(textCol))
      .select(col(idCol), col(textCol).substr(col("__i"), lit(n)).as("shingle"))

  /** MinHash signatures: k independent hashes h_k = min over shingles of
   * md5("k:" ++ shingle). Lexicographic min over hex strings is a valid
   * min-hash; one groupBy with k min-aggregates (fully map-side
   * combinable, no extra shuffle per hash). */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleLen: Int = 8, stride: Int = 4): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleLen, stride)
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: hash each band of `rowsPerBand` signature entries to a
   * bucket key; docs sharing any band bucket become candidate pairs.
   * The join key is (band, bucket) so the shuffle is by bucket — a
   * same-bucket skew burst is bounded by bucket size, never all-pairs. */
  def lshCandidates(
      sig: DataFrame, idCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val bandFrames = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"h$i"))
      sig.select(col(idCol), lit(b).as("band"),
        md5(concat(cols: _*)).as("bkey"))
    }
    val all = bandFrames.reduce(_ union _)
    val l = all.select(col(idCol).as("a"), col("band"), col("bkey"))
    val r = all.select(col(idCol).as("b"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Near-duplicate GROUPS: min-label connected components over the
   * MinHash-LSH candidate-pair graph — the step a real dedup pipeline
   * runs after candidate generation, so A~B~C collapses to ONE keeper
   * even when A and C never shared a band bucket (transitive closure).
   * Returns (idCol, group_id) for EVERY document; docs with no
   * candidate partner are their own group; group_id = min doc id in
   * the group. Scale: the pair graph is sparse by construction (pairs
   * ride band buckets, never all-pairs), and the closure is the
   * engine's change-frontier min-label CC — O(component diameter)
   * supersteps, and near-dup components are shallow (star-like around
   * shared boilerplate). */
  def nearDupGroups(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, rowsPerBand: Int = 4,
      shingleLen: Int = 8, stride: Int = 4): DataFrame = {
    import graft.core.LinkGraph
    import graft.core.LinkGraph.{DST, ID, SRC, WEIGHT}
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    val pairs = lshCandidates(
      minhashSignatures(docs, idCol, textCol, k, shingleLen, stride),
      idCol, bands, rowsPerBand)
    val sym = pairs.select(col("a").as(SRC), col("b").as(DST))
      .union(pairs.select(col("b").as(SRC), col("a").as(DST)))
      .withColumn(WEIGHT, lit(1.0))
    val cc = graft.algos.ConnectedComponents
      .run(LinkGraph(LinkGraph.partitioned(sym, p), directed = false, p))
      .components
    docs.select(col(idCol))
      .join(cc.select(col(ID).as(idCol), col("component")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("group_id"))
  }

  /** N-gram Jaccard similarity for given candidate pairs, over DISTINCT
   * char n-grams (stride 1). Returns (a, b, jac_micro). */
  def ngramJaccard(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int = 8): DataFrame = {
    val grams = shingles(docs, idCol, textCol, n, stride = 1)
      .distinct()
    val sizes = grams.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val ga = grams.select(col(idCol).as("a"), col("shingle"))
    val gb = grams.select(col(idCol).as("b"), col("shingle"))
    val inter = pairs.join(ga, Seq("a")).join(gb, Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sa")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("sz").as("sb")), Seq("b"))
      .join(inter, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        round(coalesce(col("inter"), lit(0L)) * 1e6 /
          (col("sa") + col("sb") - coalesce(col("inter"), lit(0L))), 0)
          .cast("long").as("jac_micro"))
  }

  /** Benchmark decontamination (the GPT-3-style n-gram overlap check a
   * pretraining pipeline runs before training): for each corpus
   * document, the distinct character n-grams (default 13, stride 1)
   * it shares with ANY benchmark document, and how many benchmark
   * docs it collides with. Scale shape: both sides shingle
   * partition-locally, dedupe once, and meet in a hash join ON THE
   * N-GRAM — never doc×doc; the benchmark side is orders of magnitude
   * smaller than the corpus, so AQE broadcasts it at typical sizes
   * and the corpus side never reshuffles by document. Only
   * contaminated docs are returned (the clean 99.9% produce no join
   * rows at all). */
  def contamination(
      docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 13): DataFrame = {
    val cg = shingles(docs, idCol, textCol, n, stride = 1).distinct()
    val bg = shingles(benchmark, benchIdCol, benchTextCol, n, stride = 1)
      .select(col(benchIdCol).as("__bench_id"), col("shingle")).distinct()
    cg.join(bg, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("dirty_grams"),
        countDistinct(col("__bench_id")).as("bench_docs"))
  }

  /** 32-bit SimHash over whitespace tokens: per-bit majority vote of
   * token hashes (md5 hex prefix → int). Deterministic and portable —
   * the SQL oracle reproduces it bit-for-bit. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Filter empty tokens: split on whitespace yields [""] for
    // empty/whitespace-only text, but the SQL oracle's
    // regexp_extract_all('\S+') yields zero rows — both sides must
    // drop token-less documents identically.
    val toks = docs.select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val h = toks.select(col(idCol),
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("th"))
    val votes = (0 until 32).map { j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$j")
    }
    val voted = h.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bits = (0 until 32).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col(idCol), bits.as("simhash"))
  }

  /** SimHash near-dup pairs within a blocking column (e.g. source):
   * hamming distance ≤ maxHamming.
   *
   * Candidate generation is the EXACT banded hamming join: split the
   * 32-bit signature into (maxHamming + 1) bit-bands; by pigeonhole,
   * any pair within the hamming budget agrees exactly on at least one
   * band, so joining on (block, band, band-bits) finds every such pair
   * with zero recall loss — while the join key subdivides a mega-block
   * by signature content, so no single (block) value can degenerate
   * the join toward all-pairs (the 100 TB skew guard). Verified pairs
   * are then hamming-filtered, identical output to the naive
   * within-block cross join. */
  def simhashDuplicates(
      sim: DataFrame, docs: DataFrame, idCol: String, blockCol: String,
      maxHamming: Int = 6): DataFrame = {
    val bands = maxHamming + 1
    val base = 32 / bands
    val extra = 32 % bands
    val widths = (0 until bands).map(b => base + (if (b < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val withBlock = sim.join(docs.select(col(idCol), col(blockCol)), Seq(idCol))
    val banded = (0 until bands).map { b =>
      withBlock.select(col(idCol), col("simhash"), col(blockCol),
        lit(b).as("band"),
        shiftright(col("simhash"), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)).as("bval"))
    }.reduce(_ union _)
    val l = banded.select(col(idCol).as("a"), col("simhash").as("sa"),
      col(blockCol), col("band"), col("bval"))
    val r = banded.select(col(idCol).as("b"), col("simhash").as("sb"),
      col(blockCol), col("band"), col("bval"))
    l.join(r, Seq(blockCol, "band", "bval"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may agree on several bands
  }

  /**
   * Passage-level exact dedup (the CCNet / Dolma shape: dedupe
   * SUB-document units across the whole corpus, not whole documents).
   * Documents are chunked into fixed non-overlapping `window`-token
   * passages (the deterministic chunking that makes passage identity
   * well-defined at scale); a passage survives iff this (doc, index)
   * is the globally first occurrence of its md5 — "first" by
   * (doc id, passage index), the same canonical-owner rule `exact`
   * uses. Returns one row per input document:
   * (id, n_passages, kept_passages).
   *
   * Scale shape: chunking is partition-local (one projection), the
   * owner election is one hash-shuffle groupBy on the 32-byte passage
   * hash with a map-side-combinable min, and the ownership check is a
   * co-keyed join on the same hash — no windows, no all-pairs, same
   * cost profile as [[exact]] with rows = passages instead of docs.
   */
  def passageDedup(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // Tokenize ONCE into a materialized column: higher-order functions
    // don't share subexpressions, so inlining the split meant every
    // per-chunk slice re-tokenized the whole document — measured 44x
    // slower at corpus scale (PipelineProbe: 1.7k -> 75k docs/s).
    val ts = col("__ts")
    val nChunks = ceil(size(ts) / lit(window.toDouble)).cast("int")
    val chunks = when(size(ts) > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(ts, i * window + 1, lit(window)), " ")))
      .otherwise(array())
    val hp = docs
      .select(col(idCol).as("__id"),
        filter(split(col(textCol), "\\s+"), x => x =!= "").as("__ts"))
      .select(col("__id"), posexplode_outer(chunks))
      .select(col("__id"), col("pos").cast("long").as("__idx"),
        md5(col("col")).as("__h"))
    val owner = hp.filter(col("__h").isNotNull)
      .groupBy("__h")
      .agg(min(struct(col("__id"), col("__idx"))).as("__o"))
    hp.join(owner, Seq("__h"), "left")
      .groupBy("__id")
      .agg(
        count(col("__h")).as("n_passages"),
        sum(when(col("__o.__id") === col("__id") &&
            col("__o.__idx") === col("__idx"), 1L).otherwise(0L))
          .as("kept_passages"))
      .select(col("__id").as(idCol), col("n_passages"),
        col("kept_passages"))
  }
}
