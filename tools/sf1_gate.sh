#!/bin/bash
# The sf1 (10x) bitwise scale gate: every query whose DuckDB oracle is
# cheap enough to replay on 10x data. Excluded, with reasons:
#  - x2/x10: labeled quadratic ground-truth twins (scale paths x3/x15)
#  - x3/x4/x9/x15/x58: recursive-CTE minhash/simhash/hyperplane-LCG replays
#    (oracle cost, not engine cost) — covered bitwise at the three driver SFs
#  - x14: winnowing window replay (same)
#  - x16/x46/x48/x53: transitive-closure cluster replays (same)
#  - x11/x12/x22/x23/x26: media byte-hash oracles over 10x payloads (same)
#  - x54/x59: the kmeans-refine and MMR oracles re-walk assignments /
#    greedy steps in recursive SQL — too slow on 10x (covered at driver SFs)
#  - x5: avg(double) is order-dependent float addition — passes at 1e-6,
#    not bitwise, by design (the DECIMAL money surface is immune)
#  - x15/x21/x27/x30/x44/x45/x41's span twins where the oracle re-walks
#    blocks quadratically are kept OUT only if measured slow; x41/x45 run.
#  - s2-s10 streaming twins share batch oracles already replayed above at
#    driver SFs; s1/s11/s12/s13 run here as the streaming representatives.
#  - x109: the brute ground-truth twin of x108 (x2/x10 discipline) — its
#    oracle re-scores the 256-cap sample against the full corpus
#    (256 x 50k list_cosine at sf1); oracle cost, not engine cost; covered
#    bitwise at the three driver SFs. x108 itself (IVF-probed) RUNS here:
#    its oracle replays the x13 assignment CTE, linear at 10x.
#  - x76: its oracle replays TWO brute-force all-pairs searches (64-dim
#    and projected) — oracle cost at 10x; covered at the driver SFs.
#  - x67: shares x2's oracle (the all-shingles join) — the ORACLE is the
#    quadratic-ish side at 10x; the engine path is the scale path. Covered
#    bitwise at the driver SFs + equality-with-x2 spec.
#  - x79: its oracle derives the edge set from the same all-shingles CTE
#    as x2 before the triangle join — oracle-side cost at 10x; the engine
#    path (collapsed MinHash + degree-ordered wedges) is the scale path.
#    Covered bitwise at the driver SFs.
#  - x83: same reason — its threshold-sweep ORACLE starts from the x2
#    all-shingles pair CTE at 0.7 (the ENGINE path is jaccardPairsPrefix,
#    x67's prefix-filtered plan, since round 6 — benched at sf1, plan-pinned
#    equi-joins-only). Covered bitwise at the driver SFs.
# Usage: tools/sf1_gate.sh [sf1dir]
set -e
SF1=${1:-/root/repo/localdata/sf1}
ONLY=$(printf '%s,' \
  q1_trans_summary q2_player_summary q3_clamped q4_rollup_month q5_dim_enrich \
  q6_wma q7_risky q8_ledger_merge q9_ranking q10_new_register q11_set_ops \
  q12_dep_count q13_watermark q14_slices q15_encodings q16_anti_filter \
  q17_json q18_three_way q19_sessions q20_asof q21_range_join q22_quantiles \
  q23_distinct q24_pivot q25_cube q26_star_join q27_asof_native \
  q28_range_native q29_lateral q30_unpivot q31_grouping_sets q32_lead_lag \
  q33_ntile q34_running_frames q35_approx_distinct q36_intersect \
  q37_correlated_avg q38_relative_rank q39_twap q40_retention q41_correlation q42_sliding_distinct \
  q43_funnel q44_pareto q45_equidepth q46_integrity \
  q47_copurchase q48_mad_outliers q49_communities q50_scd2 \
  r1_trans_5min r2_player_5min r3_trans_backfill r4_trans_monthly \
  s1_stream_5min s11_stream_capped s12_stream_datacard s13_stream_kmv \
  s14_stream_length_match s15_stream_drift s16_stream_next_event s17_stream_funnel \
  s18_stream_outliers s19_stream_psi x80_vocab_spectrum x81_psi_drift x82_quantile_calib \
  x1_exact_dedup x6_lang_id x7_fingerprints x17_stratified_sample \
  x18_token_shards x19_ngram_topk x20_quality_filter x24_topk_agg \
  x25_top_terms x28_redact x29_chunks x31_salted_agg x32_corpus_mix \
  x62_length_match x63_centroid_drift x13_knn_ivf x33_quantize_int8 x34_quantized_knn x35_quantized_ivf \
  x39_semantic_dup x44_ann_recall \
  x36_bpe_tokens x37_bm25 x38_repetition x40_lm_quality \
  x41_dup_spans x42_dsir_weights x43_hybrid_rrf x45_span_removal \
  x47_mixture_plan x49_frequency_cap x50_weighted_sample \
  x51_centroid_outliers x52_datacard x55_chunk_dedup x56_tfidf_terms \
  x57_curriculum x64_seeded_shuffle x65_pmi_pairs x66_zorder_layout \
  x71_decayed_activity x72_rendezvous_shards x73_pca_component \
  x74_random_projection x75_snapshot_diff x77_maxsim_retrieval \
  x78_filter_matrix \
  x68_column_profile x69_next_event_pairs x70_pagerank \
  q51_assoc_rules q52_khop x84_cms_heavy x85_sorted_neighborhood \
  x86_fuzzy_block x110_fuzzy_summary x111_fuzzy_topk x87_silhouette s20_stream_cms \
  x89_novelty x90_kanon_ladder s21_stream_kanon \
  x91_ks_matrix x92_memorization x93_kcenter_coreset \
  s22_stream_novelty x94_entropy_rate \
  x95_bigram_xent x96_benford x97_gini x98_neyman_alloc \
  q53_attribution q54_streaks s23_stream_xent s24_stream_benford \
  x99_winsorize x100_vocab_growth s25_stream_winsor \
  x101_survival x102_burstiness q55_rfm s26_stream_rollup \
  x103_cusum x104_acf s27_stream_cusum \
  q56_rolling_actives q57_wilson_ci x105_zipf_slope q58_pit_join \
  s28_stream_pit q59_conversion_lag x106_hill_tail \
  q60_ship_delay x107_chi2_mix x108_knn_agreement | sed 's/,$//')
SPARK_GRAFT_ONLY="$ONLY" exec python3 tools/check.py "$SF1" /tmp/graft_verify_sf1 --exact --only="$ONLY"
