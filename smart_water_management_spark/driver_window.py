"""Driver-window steering: pin exactly which 50 operators receive a driver
CORRECTNESS row each round.

The verification driver records results for ``sorted(queries())[:50]`` —
the first 50 registry names in alphabetical order — and nothing else.
This module takes control of the window: it registers exactly 50
``a00_NN_…`` aliases (``"a00_" < "a01_"`` in string sort, so they occupy
the whole window deterministically). Each alias shares its target's
callable and oracle verbatim — a green alias row IS a green row for the
underlying operator. Standing composition each round: ~42 slots for
operators that have never had a driver row, ~8 retention slots so every
family green in a prior round stays covered.

The natural (un-aliased) names remain registered and remain covered by
the local parity suite (tests/test_oracle_parity.py, same
row-count/schema/hash protocol); README.md documents the mapping.

Round-9 window (this file's DRIVER_WINDOW, per VERDICT r8 directive
#1): the first 42 names of the round-8 ROUND9_CANDIDATES queue in
their listed order (x100/w24/c15/m16/c16 lead — the r7 long tail:
a37–a39, m16–m23, v14–v17, w24–w27, t24–t27, x100–x116), plus the
same 8 retention reps as round 8 (u01/u03/p02/d01/k01/o01/q05/p90 —
nothing lapses this round). The 11 rows-only names (m02/m03/m05,
x12/x29/x54/x55/x61/x65/x68, x123) are never windowed. Round-8 went
50/50 green; cumulative driver-green natural names before this
rotation: 261/406; after a green round 9: 303.

Round-8 window, for the record (per VERDICT r7 directives #1/#6):
42 first-time names — the first 38 of ROUND8_CANDIDATES in queue
order plus p13/p14/p15/o06 pulled forward — and 8 retention reps
with the lapsed u01/u03/p02/d01 restored. 50/50 green in
CORRECTNESS_r08.

Round-10 rotation plan (once CORRECTNESS_r09 lands): fill first-time
slots from ROUND10_CANDIDATES below in listed order, keep the 8-rep
retention shape, and never window the rows-only names.
"""

from __future__ import annotations

from .registry import register_alias

# Slot order groups the never-driver-tested surfaces first, then the
# retention reps for already-green families. Order within the window is
# cosmetic — membership is what the driver records.
DRIVER_WINDOW: list[str] = [
    # round-9 first-time slots 1-42: the round-8 ROUND9_CANDIDATES queue
    # in listed order (VERDICT r8 directive #1).
    "x100_stable_docid_assignment",
    "w24_activity_streaks",
    "c15_scd3_previous_value",
    "m16_period_detection",
    "c16_forget_user",
    "x101_hapax_density",
    "v14_column_profile",
    "a37_spearman_corr",
    "a38_chisq_independence",
    "v15_fd_discovery",
    "x102_url_canonical_dedup",
    "x103_token_budget_waterfill",
    "m17_holt_winters",
    "m18_ab_proportion_test",
    "w25_ewma_control",
    "m19_changepoint_detection",
    "x104_psi_drift",
    "x105_triangle_count",
    "t24_streaming_ab_monitor",
    "x106_vocab_coverage_curve",
    "x107_lsh_scurve_planner",
    "w26_rolling_higher_moments",
    "t25_streaming_psi_monitor",
    "x108_expected_lsh_recall",
    "x109_dedup_token_savings",
    "x110_quality_length_mi",
    "m20_segmented_trend",
    "t26_streaming_changepoint",
    "v16_quantile_drift",
    "x111_bigram_entropy_rate",
    "x112_stratified_quality_auc",
    "a39_conversion_latency",
    "m21_pacf_profile",
    "x113_minhash_estimator_audit",
    "x114_dedup_survivorship_audit",
    "t27_streaming_conversion_latency",
    "x115_dedup_method_agreement",
    "m22_forecast_backtest",
    "m23_trend_prediction_bands",
    "x116_filter_ablation",
    "v17_uniqueness_discovery",
    "w27_interevent_gap_distribution",
    # slots 43-50: retention reps — unchanged from round 8, so no
    # family coverage lapses (u*/p*/d* restored in r8 stay; k/o/q/p90
    # keep their standing coverage).
    "u01_union_by_name",
    "u03_multiset_ops",
    "p02_case_when_bands",
    "d01_keyed_dedup",
    "k01_salted_skew_agg",
    "o01_topk_orders",
    "q05_district_performance",
    "p90_domain_pipeline",
]

assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)

# Round-10 rotation candidates, in priority order: the 45 oracle-backed
# natural names left in the round-8 queue after the 42 windowed above,
# plus round-9 additions appended as they land. Kept as data so
# tests/test_oracle_parity.py can assert every name exists and is
# oracle-backed BEFORE the round-10 edit happens.
ROUND10_CANDIDATES: list[str] = [
    "x117_shard_manifest",
    "m24_hw_backtest",
    "k07_shuffle_hash_join",
    "s24_csv_dialect_matrix",
    "x118_dedup_idempotence",
    "f21_binary_codecs",
    "m25_decomposition_strength",
    "x119_mmr_diversity_rerank",
    "x120_cluster_term_labels",
    "c17_versioned_snapshot_read",
    "x121_decontam_ngram_sweep",
    "d02_normalized_dedup",
    "m26_ljung_box",
    "v18_arrival_completeness",
    "x122_training_mix_manifest",
    "w29_rolling_cross_correlation",
    "a41_cooccurrence_pairs",
    "x124_png_metadata_audit",
    "x125_wav_fingerprint_dedup",
    "x126_caption_image_consistency",
    "a42_kendall_tau",
    "x127_embedding_mmd_matrix",
    "x128_quality_signal_bundle",
    "x129_contamination_matrix",
    "t28_streaming_mmd_monitor",
    "m27_diebold_mariano",
    "x130_hybrid_rrf_fusion",
    "w30_rolling_window_quantiles",
    "p16_q04_shape",
    "m28_two_changepoint_trend",
    "v19_rule_cooccurrence",
    "x131_curriculum_schedule",
    "x132_leakage_free_split",
    "m29_kaplan_meier",
    "x133_rag_context_pack",
    "x134_cosine_lexical_calibration",
    "p17_q18_shape",
    "p18_q19_shape",
    "x135_eval_quota_apportionment",
    "a43_wilson_intervals",
    "x136_recency_weighted_sample",
    "w31_sax_motifs",
    "x137_prefix_cache_reuse",
    "j14_temporal_anti_join",
    "m30_auto_model_select",
    # round-9 additions (all exact-oracle, replayed sf0.001+sf0.01+sf0.1)
    "p19_q03_shape",
    "p20_q05_shape",
    "p21_q07_shape",
    "p22_q08_shape",
    "p23_q09_shape",
    "p24_q10_shape",
    "p25_q12_shape",
    "p26_q14_shape",
    "p27_q22_shape",
    "x138_gif_frame_dedup",
    "x139_png_text_metadata",
    "x140_dup_span_coverage",
    "x141_ngram_diversity",
    "a44_kruskal_wallis",
    "m31_page_hinkley",
    "t29_streaming_page_hinkley",
    "k08_multi_distinct_rewrite",
    "w32_hampel_filter",
    "u04_union_allow_missing",
    "j15_null_safe_join",
    "x142_lsh_autotuner",
    "m32_robust_decomposition",
    "o07_topk_with_ties",
    "t30_streaming_hampel",
    "a45_friedman_test",
    "m33_seasonal_mann_kendall",
    "w33_calendar_deltas",
    "p28_q06_shape",
    "d03_golden_record",
    "m34_bootstrap_ci",
    "t31_streaming_bootstrap_ci",
    "k09_aqe_coalesce",
    "a46_brown_forsythe",
    "w34_max_drawdown",
    "m35_grubbs_outlier",
    "t32_streaming_drawdown",
    "j16_blocked_fuzzy_join",
    "k10_eager_aggregation",
    "x143_winnowing_fingerprints",
    "x144_fim_span_audit",
    "x145_soft_dedup_weights",
    "x146_domain_affinity_matrix",
    "m36_multiple_regression",
    "c18_late_arriving_dimension",
    "a47_cochran_armitage",
    "t33_streaming_regression",
    "x147_image_downsample",
    "x148_audio_decimate",
    "t34_streaming_winnow_monitor",
    "v20_l_diversity",
    "m37_croston_intermittent",
    "x150_containment_dedup",
]

for _i, _target in enumerate(DRIVER_WINDOW, start=1):
    try:
        register_alias(f"a00_{_i:02d}_{_target}", _target)
    except KeyError:
        # Skip ONLY when an optional module failed to import (package
        # __init__ tolerates that): its registrations are absent and the
        # natural names slide into the vacated window slots. With a fully
        # imported registry a missing target is a typo'd DRIVER_WINDOW
        # entry — fail fast (registry.register_alias's contract).
        from . import _FAILED_OPTIONAL

        if not _FAILED_OPTIONAL:
            raise
