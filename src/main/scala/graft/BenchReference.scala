package graft

/**
 * Committed per-query reference seconds (sf0.1, local[32]) used by
 * [[Bench]]'s end-of-sweep outlier arbitration: a query whose best-of-2
 * exceeds 2x its reference here gets a third timing pass at sweep END,
 * when the contended window that inflated both in-sweep passes has
 * usually moved on (round 4 recorded q_ktruss at 110.5 s inside one
 * contended window; an idle-host probe on the identical plan measured
 * 39.5 s — see BENCH.md).
 *
 * Round-6 refresh (VERDICT r5 "Next" #3: the stale r4 q_force_atlas2
 * entry put its trigger at 26.6 s, so a 20 s load-inflated reading
 * sailed through, and the 20 round-5 queries had no entry at all):
 * each value is the MINIMUM trusted reading across (a) the r4 table,
 * (b) the driver's committed round-5 sweep (BENCH_LAST.json at round-5
 * close), and (c) this round's idle-host single-query probes — the
 * reference's job is to approximate an uncontended time, so the lowest
 * trusted observation is the right estimator. Every query that has
 * ever recorded >= 3 s is covered; anything absent falls back to the
 * absolute 45 s rerun cap. Update per round alongside BENCH.md.
 */
object BenchReference {
  val seconds: Map[String, Double] = Map(
    "q_ktruss" -> 36.0,
    "q_core_number_out" -> 23.3,
    "q_triangles" -> 22.6,
    "q_ecg" -> 19.5,
    "q_core_number_in" -> 17.6,
    "q_leiden" -> 14.2,
    "q_spectral_k" -> 14.1,
    "q_core_number" -> 13.2,
    "q_force_atlas2" -> 12.3,
    "q_edge_betweenness" -> 11.5,
    "q_spectral_mod" -> 11.1,
    "q_flatten_dendrogram" -> 10.8,
    "q_mst_max" -> 10.5,
    "q_louvain" -> 10.3,
    "q_spectral" -> 10.2,
    "q_mst" -> 9.8,
    "q_scc" -> 9.8,
    "q_betweenness" -> 9.5,
    "q_web_triangles" -> 8.6,
    "q_sssp_utils" -> 7.8,
    "q_sssp" -> 7.0,
    "q_is_bipartite" -> 7.0,
    "q_extract_paths" -> 6.3,
    "q_node2vec" -> 5.9,
    "q_random_walks" -> 5.9,
    "q_traversed_cost" -> 5.9,
    "q_hits" -> 5.3,
    "q_web_host_pagerank" -> 5.3,
    "q_pagerank_personalized" -> 5.2,
    "q_pagerank_weighted" -> 5.1,
    "q_katz" -> 5.0,
    "q_pagerank" -> 5.0,
    "q_doc_decontaminate" -> 5.0,
    "q_checkpoint_roundtrip" -> 4.9,
    "q_doc_dedup_groups" -> 4.8,
    "q_bicliques" -> 4.6,
    "q_pagerank_top10" -> 4.6,
    "q_bfs" -> 4.6,
    "q_lpa" -> 4.2,
    "q_pg_stats" -> 4.1,
    "q_web_lpa" -> 3.9,
    "q_ms_bfs" -> 3.9,
    "q_eigenvector" -> 3.9,
    "q_graph_stats" -> 3.9,
    "q_web_pagerank_top10" -> 3.9,
    "q_biased_walks" -> 3.5,
    "q_doc_simhash_dups" -> 3.4,
    "q_bicliques_stats" -> 3.2,
    "q_doc_minhash_lsh" -> 3.2,
    "q_wcc" -> 2.8,
    "q_embed_ann_ivf" -> 2.2
  )
}
