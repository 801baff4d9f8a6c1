package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.DenseRank

/**
 * Top-k maximal-biclique heuristic over a bipartite edge list —
 * reference `python/cugraph/cugraph/experimental/structure/bicliques.py:20`
 * (`EXPERIMENTAL__find_bicliques`, the last exported callable in the
 * reference's public `__init__`).
 *
 * Reference semantics (host loop, one feature at a time): walk features
 * (dst) in descending machine-degree order; for feature f take its
 * machine set M(f); skip f when M(f) equals the previous feature's set;
 * otherwise count, over all edges of M(f)'s machines, how many machines
 * share each feature f', and keep C(f) = { f' : |M(f) ∩ M(f')| >=
 * int(deg(f) * support) } (which always contains f itself). Emit the
 * biclique (M(f), C(f)) — ids one-up in visit order — when |C(f)| >
 * minFeatures and |M(f)| >= minMachines; stop after k emissions or
 * maxIter features. `bicliques.py:105-146`. Stats per emission mirror
 * `update_results` (`bicliques.py:223-297`): machine/feature counts and
 * bad_ratio = flagged-machine-count / total (the code divides by total,
 * not by machines — we mirror the code, not the docstring).
 *
 * Spark-first redesign — the reference's loop runs one join PER
 * FEATURE from the host; here every per-feature quantity is computed
 * for ALL features at once:
 *  - per-feature degree / flag-count / machine-set fingerprint: one
 *    hash aggregate over the edge table (map-side combinable). The
 *    fingerprint is bit_xor of a 60-bit md5 prefix per machine id —
 *    order-independent and overflow-free; paired with the degree it
 *    replaces the reference's src-set merge equality check
 *    (`bicliques.py:199-208`) with a deterministic set hash.
 *  - the skip-if-same-as-last rule and one-up ids ride [[DenseRank]]
 *    (range-partition + per-partition offsets) plus a self-join on
 *    rn−1 — NO global window: the feature summary is
 *    vocabulary-sized at corpus scale and a global
 *    `row_number()/lag over (order by …)` funnels it through one
 *    task.
 *  - candidate sets C(f) for every surviving feature come from ONE
 *    self-join on the machine key (co-occurrence counts), restricted
 *    to features that can still emit (kept, deg >= minMachines). Skew
 *    bound: the join fans out per machine as (features per machine)²;
 *    at web scale cap or salt mega-degree machines upstream — the
 *    restriction to kept features already drops the long tail.
 */
object Bicliques {

  /** members: (id, vert, type 0=machine/1=feature); stats: (id, total,
   * machines, features, bad_ratio_micro). */
  final case class Result(members: DataFrame, stats: DataFrame)

  /** Features per co-occurrence chunk: a machine with more features
   * than this has its feature list split into ⌈d/B⌉ chunks and the
   * pair count runs per chunk pair, bounding any single task's fanout
   * at B² (~16M streamed pair rows at the default) instead of d². */
  val DefaultCoocChunkSize = 4096

  def findBicliques(
      edges: DataFrame,
      k: Int = -1,
      maxIter: Int = -1,
      support: Double = 1.0,
      minFeatures: Int = 1,
      minMachines: Int = 10,
      maxMachineDegree: Int = 0,
      coocChunkSize: Int = DefaultCoocChunkSize): Result = {
    require(support > 0.0 && support <= 1.0, "support must be in (0, 1]")
    val numPartitions =
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

    // Distinct (src, dst) with a deterministic flag (reference input
    // contract: one row per bipartite edge, flag marks bad machines).
    val e = edges
      .groupBy(col("src"), col("dst"))
      .agg(max(coalesce(col("flag"), lit(0)).cast("int")).as("flag"))

    // Per-feature summary: degree, flagged-machine count, set hash.
    val srcHash =
      conv(substring(md5(col("src").cast("string")), 1, 15), 16, 10)
        .cast("long")
    val feat = e.groupBy(col("dst"))
      .agg(count(lit(1)).as("deg"), sum(col("flag")).as("bad"),
        expr("bit_xor(" +
          "cast(conv(substring(md5(cast(src as string)),1,15),16,10)" +
          " as bigint))").as("fp"))

    // Visit order (reference f_list sort, tie-broken by dst for
    // determinism), maxIter cap, skip-if-same-machine-set-as-last.
    // The rank is DenseRank (range-partition + per-partition offsets),
    // NOT a global `row_number() over (order by …)` window — the
    // feature summary is vocabulary-sized on a doc×token lift (10^7+
    // distinct features at corpus scale) and a global window funnels
    // all of it through one task. The previous row's (deg, fp) comes
    // from a self-join on rn−1 (unique key, no skew) instead of `lag`
    // over the same global window.
    val ranked = DenseRank.assign(feat,
      Seq(col("deg").desc, col("dst").asc), numPartitions, "rn0")
      .withColumn("rn", col("rn0") + 1).drop("rn0")
    val prev = ranked.select((col("rn") + 1).as("rn"),
      col("deg").as("prev_deg"), col("fp").as("prev_fp"))
    val ordered = ranked.join(prev, Seq("rn"), "left")
      .withColumn("same_as_last",
        col("deg") === col("prev_deg") && col("fp") === col("prev_fp"))
      .drop("prev_deg", "prev_fp")
    val capped =
      if (maxIter >= 0) ordered.filter(col("rn") <= maxIter) else ordered
    val kept = capped
      .filter(!coalesce(col("same_as_last"), lit(false)))
      .select(col("dst").as("f"), col("deg"), col("bad"), col("rn"))
      // deg < minMachines can never emit; don't pay its co-occurrence
      .filter(col("deg") >= minMachines)

    // C(f) via co-occurrence: |M(f) ∩ M(f')| for every kept f.
    // kept can be |F|-sized — a plain equi-join (AQE broadcasts it
    // when it is in fact small), unlike the k-row topK probes below.
    // `maxMachineDegree > 0` remains the optional APPROXIMATION knob
    // (drop mega machines outright, reference small-|M(f)| regime);
    // with it off the count is EXACT and skew-safe: the machine-key
    // self-join fans out as (features per machine)², and a mega-degree
    // machine (a doc containing 10^6 distinct tokens on a doc×token
    // lift) alone produces 10^12 pairs through ONE join bucket. When
    // any machine exceeds `coocChunkSize`, its feature list is split
    // into n = ⌈d/B⌉ deterministic hash chunks and each side is
    // replicated across the other's chunk index, so the pair (f, f')
    // meets exactly once at key (src, chunk(f), chunk(f')) — the same
    // counts, but every join bucket is bounded by B² pair rows and the
    // buckets hash-spread across the cluster. Machines at or under B
    // have n = 1 and degenerate to the plain single-bucket join; the
    // chunked plan only runs at all when a probe finds a mega machine.
    val eCooc =
      if (maxMachineDegree <= 0) e
      else {
        val mdeg = e.groupBy(col("src"))
          .agg(count(lit(1)).as("__mdeg"))
          .filter(col("__mdeg") <= maxMachineDegree)
          .select(col("src"))
        e.join(mdeg, Seq("src"))
      }
    val mdegAll = eCooc.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val maxMdeg = mdegAll.agg(max(col("__d"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val keptF = kept.select("f")
    val cooc =
      if (maxMdeg <= coocChunkSize) {
        val left = eCooc.select(col("dst").as("f"), col("src"))
          .join(keptF, Seq("f"))
        left.join(eCooc.select(col("src"), col("dst").as("f2")), Seq("src"))
          .groupBy(col("f"), col("f2")).agg(count(lit(1)).as("shared"))
      } else {
        val eC = eCooc
          .join(mdegAll, Seq("src"))
          .withColumn("__n",
            ceil(col("__d") / lit(coocChunkSize.toDouble)).cast("int"))
        val left = eC
          .select(col("src"), col("dst").as("f"),
            pmod(xxhash64(col("dst")), col("__n")).cast("int").as("ci"),
            col("__n"))
          .join(keptF, Seq("f"))
          .withColumn("cj", explode(sequence(lit(0), col("__n") - 1)))
          .select(col("src"), col("f"), col("ci"), col("cj"))
        val right = eC
          .select(col("src"), col("dst").as("f2"),
            pmod(xxhash64(col("dst")), col("__n")).cast("int").as("cj"),
            col("__n"))
          .withColumn("ci", explode(sequence(lit(0), col("__n") - 1)))
          .select(col("src"), col("f2"), col("ci"), col("cj"))
        left.join(right, Seq("src", "ci", "cj"))
          .groupBy(col("f"), col("f2")).agg(count(lit(1)).as("shared"))
      }
    val candRows = cooc.join(kept, Seq("f"))
      .filter(col("shared") >=
        floor(col("deg") * lit(support)).cast("long"))
      .select(col("f"), col("f2"), col("deg"), col("bad"), col("rn"))

    val perF = candRows.groupBy(col("f"), col("deg"), col("bad"), col("rn"))
      .agg(count(lit(1)).as("n_feat"))
      .filter(col("n_feat") > minFeatures)

    // One-up ids in visit order over the emitted features only —
    // DenseRank again (rn is unique, so the order is total); the
    // emitted set can be as large as the kept set when k < 0.
    val withId = DenseRank.assign(perF, Seq(col("rn").asc),
      numPartitions, "id0")
      .withColumn("id", col("id0").cast("int")).drop("id0")
    val topK = (if (k >= 0) withId.filter(col("id") < k) else withId)
      .select(col("f"), col("id"), col("deg"), col("bad"), col("n_feat"))

    val machines = e.select(col("dst").as("f"), col("src"))
      .join(broadcastIfSmall(topK.select("f", "id")), Seq("f"))
      .select(col("id"), col("src").cast("string").as("vert"),
        lit(0).as("type"))
    val features = candRows.select(col("f"), col("f2"))
      .join(broadcastIfSmall(topK.select("f", "id")), Seq("f"))
      .select(col("id"), col("f2").cast("string").as("vert"),
        lit(1).as("type"))
    val members = machines.unionByName(features)

    val stats = topK.select(col("id"),
      (col("deg") + col("n_feat")).as("total"),
      col("deg").as("machines"),
      col("n_feat").as("features"),
      round(col("bad") * lit(1e6) / (col("deg") + col("n_feat")), 0)
        .cast("long").as("bad_ratio_micro"))

    Result(members, stats)
  }

  /** Emitted bicliques are k (or few) rows — broadcast these probe
   * sides so the edge table never reshuffles for member extraction. */
  private def broadcastIfSmall(df: DataFrame): DataFrame = broadcast(df)
}
