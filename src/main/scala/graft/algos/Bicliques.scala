package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
 *  - the skip-if-same-as-last rule and one-up ids are lag/row_number
 *    windows over the FEATURE SUMMARY (|F| rows, edges never pass
 *    through a window) — the same |F|-sized list the reference sorts
 *    and iterates on the host.
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

  def findBicliques(
      edges: DataFrame,
      k: Int = -1,
      maxIter: Int = -1,
      support: Double = 1.0,
      minFeatures: Int = 1,
      minMachines: Int = 10): Result = {
    require(support > 0.0 && support <= 1.0, "support must be in (0, 1]")

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
    val order = Window.orderBy(col("deg").desc, col("dst").asc)
    val ordered = feat
      .withColumn("rn", row_number().over(order))
      .withColumn("same_as_last",
        col("deg") === lag("deg", 1).over(order) &&
          col("fp") === lag("fp", 1).over(order))
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
    val left = e.select(col("dst").as("f"), col("src"))
      .join(kept.select("f"), Seq("f"))
    val cooc = left
      .join(e.select(col("src"), col("dst").as("f2")), Seq("src"))
      .groupBy(col("f"), col("f2")).agg(count(lit(1)).as("shared"))
    val candRows = cooc.join(kept, Seq("f"))
      .filter(col("shared") >=
        floor(col("deg") * lit(support)).cast("long"))
      .select(col("f"), col("f2"), col("deg"), col("bad"), col("rn"))

    val perF = candRows.groupBy(col("f"), col("deg"), col("bad"), col("rn"))
      .agg(count(lit(1)).as("n_feat"))
      .filter(col("n_feat") > minFeatures)

    // One-up ids in visit order over the emitted features only.
    val emitOrder = Window.orderBy(col("rn").asc)
    val withId = perF.withColumn("id",
      (row_number().over(emitOrder) - 1).cast("int"))
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
