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
 * each value is the MINIMUM trusted reading across (a) the prior
 * table, (b) this round's idle-host full sweeps (start-of-round
 * 405.7 s and close-of-round 371.7 s) — the reference's job is to
 * approximate an uncontended time, so the lowest trusted observation
 * is the right estimator. Regenerated at round close so the
 * thresholds track this round's faster normals (a load-inflated
 * q_ktruss reading now re-arbitrates at 25 s, not 72 s). Queries now
 * under 2 s (including publish-or-reuse dependents like
 * q_flatten_dendrogram, whose recorded best-of-2 reads the shared
 * frame) carry no entry and fall back to the absolute 45 s rerun cap
 * — a sub-second entry would force a pointless third pass every
 * sweep. Update per round alongside BENCH.md.
 */
object BenchReference {
  val seconds: Map[String, Double] = Map(
    "q_core_number_in" -> 14.2,
    "q_core_number_out" -> 13.2,
    "q_spectral_k" -> 13.0,
    "q_ktruss" -> 12.6,
    "q_ecg" -> 12.0,
    "q_leiden" -> 9.8,
    "q_spectral_mod" -> 9.7,
    "q_core_number" -> 9.2,
    "q_spectral" -> 8.9,
    "q_edge_betweenness" -> 7.3,
    "q_scc" -> 7.1,
    "q_triangles" -> 6.9,
    "q_betweenness" -> 6.9,
    "q_sssp" -> 6.8,
    "q_is_bipartite" -> 6.2,
    "q_mst_max" -> 5.6,
    "q_force_atlas2" -> 5.6,
    "q_louvain" -> 5.4,
    "q_mst" -> 5.4,
    "q_web_host_pagerank" -> 5.0,
    "q_pagerank_personalized" -> 4.7,
    "q_pagerank_weighted" -> 4.7,
    "q_node2vec" -> 4.7,
    "q_doc_decontaminate" -> 4.6,
    "q_bicliques" -> 4.6,
    "q_random_walks" -> 4.3,
    "q_pagerank" -> 4.2,
    "q_katz" -> 4.2,
    "q_checkpoint_roundtrip" -> 4.2,
    "q_doc_dedup_groups" -> 3.9,
    "q_eigenvector" -> 3.9,
    "q_bfs" -> 3.9,
    "q_hits" -> 3.6,
    "q_pg_stats" -> 3.6,
    "q_ms_bfs" -> 3.5,
    "q_biased_walks" -> 3.5,
    "q_lpa" -> 3.2,
    "q_web_pagerank_top10" -> 3.2,
    "q_bicliques_stats" -> 3.2,
    "q_graph_stats" -> 3.0,
    "q_doc_simhash_dups" -> 3.0,
    "q_web_anchor_text" -> 2.9,
    "q_doc_repetition" -> 2.8,
    "q_wcc" -> 2.7,
    "q_wjaccard" -> 2.6,
    "q_web_crawl_depth" -> 2.6,
    "q_web_lpa" -> 2.5,
    "q_embed_near_dup" -> 2.5,
    "q_two_hop" -> 2.4,
    "q_npartite_sets" -> 2.4,
    "q_doc_minhash_lsh" -> 2.3,
    "q_mtx_roundtrip" -> 2.2,
    "q_web_triangles" -> 2.2,
    "q_symmetrize" -> 2.2,
    "q_spectral_metrics" -> 2.1,
    "q_pg_renumber" -> 2.0,
    "q_adj_sample" -> 2.0,
    "q_extract_paths" -> 2.0,
    "q_adj_roundtrip" -> 2.0
  )
}
