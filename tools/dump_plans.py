#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline queries.

Usage: python tools/dump_plans.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
import smart_water_management_spark as swm
from smart_water_management_spark.registry import _REGISTRY

SHOW = [
    ("a01_multi_agg_pricing", "flagship grouped aggregation — partial+final hash agg, pushdown, codegen"),
    ("j03_star_join", "star join — dimensions broadcast, fact never shuffles"),
    ("j10_range_join", "range join — bucketized equi-join, no nested loop"),
    ("w02_range_rolling", "multi-horizon rolling windows — ONE exchange for 25 columns"),
    ("k01_salted_skew_agg", "salted skew aggregation — shuffle on (key, salt)"),
    ("k02_bucketed_join", "bucketed co-located join — zero exchange on join keys"),
    ("k03_dynamic_partition_pruning", "dynamic partition pruning — runtime dim subquery in PartitionFilters"),
    ("s05_partitioned_sink_prune", "partition-pruned scan — PartitionFilters visible"),
    ("v01_fused_validation", "fused validation — N rules, one scan"),
    ("k04_skew_join_salted", "salted hot-key join — (key, salt) spreads the 95% key across reducers"),
    ("w13_time_weighted_avg", "time-weighted average — lag window + groupBy share ONE exchange"),
    ("x27_unigram_logppl", "unigram-LM perplexity — word-count shuffle shape, 1-row total broadcast"),
    ("x28_rrf_fusion", "reciprocal-rank fusion — broadcast scoring, three rank windows, ONE exchange"),
    ("x36_tile_dedup", "tile-level substring dedup — two hash shuffles (tile-hash stats, per-doc reduce), never all-pairs"),
    ("k05_zorder_layout", "Z-order layout stats — one fact scan, row-doubling explode, one hash agg; interleave is JVM arithmetic"),
    ("j12_nearest_asof", "nearest-as-of join — ONE union + one shuffle/sort, RANGE-framed carries in both directions, no re-joins"),
    ("k06_bloom_prefilter", "bloom-filter semi-join pre-filter — 2048-bit literal bitset applied inside the fact scan's Filter, one shuffle total"),
    ("x48_label_cohesion", "label cohesion audit — O(n) moment sums replace the O(n^2) pairwise cosine sweep"),
    ("p06_correlated_scalar_subquery", "correlated scalar subquery — decorrelated to ONE per-key pre-aggregation + join (no per-row re-execution)"),
    ("p08_not_exists_scalar", "scalar threshold + NOT EXISTS — 1-row broadcast + broadcast left-anti join on pre-filtered keys"),
    ("c11_recursive_hierarchy", "native Spark 4 WITH RECURSIVE — per-step frontier join, depth-bounded iteration (UnionLoop)"),
    ("w19_gapfill_interpolate", "gap-fill linear interpolation — all four neighbor lookups fused into ONE Window pass reusing the event_type exchange"),
    ("a29_sample_quantile_sketch", "bottom-k sample-quantile sketch — WindowGroupLimit rank pushdown: partial bottom-k BEFORE the exchange, no global sort"),
    ("j13_pit_scd2_lookup", "point-in-time SCD2 lookup — versioned dim broadcasts, validity range rides the hash join, facts never shuffle"),
    ("x86_ivf_recall_audit", "deterministic IVF recall audit — constant centroid table broadcast, argmax-over-cells window, bounded ground truth"),
    ("x73_matryoshka_topk", "Matryoshka truncated-dim top-k — one scored pass, two rank windows over a single qid exchange"),
    ("w21_cusum_drift", "CUSUM drift detection — ONE event-stream exchange reused by the ordering window, both running-extrema windows AND the final partial+final agg"),
    ("x92_weighted_reservoir", "weighted reservoir sample — distributed TakeOrderedAndProject top-k, zero shuffle of the corpus"),
    ("x94_rake_keyphrases", "RAKE keyphrases — pinned segmentation window shared by 3 consumers, all-integer scoring, TakeOrdered top-k before the rank window"),
    ("p09_q21_shape", "Q21 semi/anti chain — EXISTS/NOT EXISTS as residual-bearing equi-joins on l_orderkey, dims broadcast"),
    ("w22_time_decay_mean", "half-life decayed mean — unordered aggregate shape: two map-combined aggs, broadcast max, NO window operator"),
    ("m12_classical_decomposition", "classical decomposition — map-combined hourly pre-agg, ONE shared 25-term MA window, decimal-exact detrending"),
    ("o05_pareto_skyline", "Pareto skyline — price-level pre-agg + ONE partitioned running-max window + broadcast join-back; no all-pairs dominance test"),
    ("x100_stable_docid_assignment", "sort-free dense id enumeration — 4096 parallel bucket rank windows (3-hex-char prefix, r7 fix of the 16-way ceiling) + broadcast offset prefix sum; the oracle's global ROW_NUMBER never materializes"),
    ("p11_q20_shape", "Q20 correlated-agg threshold — quarter pre-agg once, year threshold as a window over the SAME shuffle, exact-decimal 2q>y"),
    ("a35_rfm_segments", "RFM segmentation — percentile thresholds broadcast back, CASE banding: zero windows, zero global sorts"),
    ("m14_ks_drift_test", "two-sample KS — distinct-value support, bounded type fanout, per-type ECDF windows; raw events never enter the grid"),
    ("a37_spearman_corr", "ties-aware Spearman — distinct-value rank maps BROADCAST onto one fact scan; no global row sort anywhere"),
    ("p13_q02_shape", "Q2 min-cost decorrelation — per-part MIN pre-agg + equi-join back, part/supplier/nation broadcast"),
    ("m19_changepoint_detection", "least-squares change-point — prefix-moment windows + argmin rank share ONE event_type exchange over the hourly grid"),
    ("m21_pacf_profile", "PACF — the whole Durbin-Levinson recursion inside one fold over the 6-element ACF array; no iterative joins"),
    ("w26_rolling_higher_moments", "rolling skew/kurtosis — ROLLING-FOLD device: per-row 24-slice folds in-row, no Window operator at all"),
    ("x105_triangle_count", "near-dup graph triangles — ordered-wedge equi-join plan on the bounded banded pair set, wedge counts from the degree table"),
    ("x106_vocab_coverage_curve", "vocab coverage curve — TakeOrdered bounds the candidate vocab (per-partition heaps); the K-sweep is conditional sums"),
    ("x113_minhash_estimator_audit", "MinHash estimator calibration — banded candidates, signature equi-join back, 17-row calibration table"),
    ("t26_streaming_changepoint", "streaming change-point — m19 over an incrementally MIN/SUM-merged exact-decimal hourly grid (calendar-bounded state)"),
    ("x119_mmr_diversity_rerank", "MMR diversity rerank — broadcast-query relevance pass, then greedy rounds over the bounded per-query candidate grid"),
    ("o06_nucleus_cover", "nucleus cover — per-type windows over the (type,user) pre-agg; the 90% boundary tested in exact decimal (cum*10 >= total*9)"),
    ("c17_versioned_snapshot_read", "versioned snapshot read — version=N partition pruning makes time travel touch ONE version's files"),
    ("x121_decontam_ngram_sweep", "decontamination n-sweep — per-n gram fanouts share one token scan; each overlap is a gram-hash semi-join"),
    ("p19_q03_shape", "Q3 top-10 open revenue — customer broadcast into date-pruned orders/lineitem, exact-decimal revenue, TakeOrderedAndProject (no global sort)"),
    ("p22_q08_shape", "Q8 market share — 8-table star: every dimension broadcast, ONE fact shuffle on l_orderkey, conditional-sum share ratio"),
    ("p27_q22_shape", "Q22 inactive rich accounts — 1-row decimal-avg threshold broadcast + left-anti on recency-filtered order keys"),
    ("x140_dup_span_coverage", "ExactSubstr span coverage — gram-md5 hash join + HAVING-count semi join, per-doc span-union in ONE window sweep"),
    ("x138_gif_frame_dedup", "GIF frame-sequence dedup — Arrow encode/decode/aHash stages, (frame,hash) bucket pair join, pointer-jump components"),
    ("k08_multi_distinct_rewrite", "multi-count-distinct rewrite — three per-column two-phase aggs joined on the group key; NO Expand row replication"),
    ("a44_kruskal_wallis", "Kruskal-Wallis — 150-cell grid is the only shuffle; ranks from the broadcast 50-value domain, fixed-order group fold"),
    ("w32_hampel_filter", "Hampel filter — rolling median/MAD as in-row selections over 24-slices; no Window operator, no rounding devices"),
    ("m31_page_hinkley", "Page-Hinkley — 6-wide running-mean fold over the map-combined hourly grid; O(hours) state per type"),
    ("x142_lsh_autotuner", "LSH auto-tuner — banded candidate histogram (20 rows) x literal config grid; planning constants never touch an engine power function"),
    ("x122_training_mix_manifest", "training-mix manifest — dedup components + Gopher flags + waterfill composed; no new shuffle class anywhere"),
    ("k10_eager_aggregation", "eager aggregation — lineitem pre-folded BY THE JOIN KEY below the join; the join probes one row per order, not one per item"),
    ("m36_multiple_regression", "closed-form multiple OLS — nine map-combined decimal moments, Cramer solve in shared formula strings; zero iterations"),
    ("j16_blocked_fuzzy_join", "blocked fuzzy self-join — (first-token, length) hash equi-join bounds the Levenshtein candidate set; no all-pairs scan"),
    ("x143_winnowing_fingerprints", "winnowing fingerprints — per-doc gram windows select ~2/(W+1) minima; share join hash-partitions on the fingerprint"),
    ("w34_max_drawdown", "max drawdown — cum/runmax/dd windows over the cohort-day grid (not raw events), all exact decimals"),
    ("x123_ann_mmr_rerank", "ANN->MMR composition — the rerank rides x65's IVF+PQ candidate stream: (qid,cell) probe join bounds the scan, no corpus crossJoin"),
    ("x129_contamination_matrix", "cross-source contamination matrix — ONE md5-gram equi-join computes every source pair; the source grid attaches by broadcast"),
    ("a42_kendall_tau", "Kendall tau-b — fact table collapses to the 50x11 value-domain cell grid; concordant/discordant mass from a broadcast cell self-join"),
    ("m28_two_changepoint_trend", "two-change-point segmentation — calendar-bounded prefix-moment pair grid, O(1) cost per cell, one rank-window argmin"),
    ("x131_curriculum_schedule", "curriculum schedule — x100's two-phase enumeration per (band, bucket): parallel rank windows + broadcast offset prefix"),
    ("x127_embedding_mmd_matrix", "linear-MMD drift matrix — posexplode to 640 integer moment keys, then a corpus-size-independent label x label broadcast join"),
    ("k11_parquet_agg_pushdown", "parquet aggregate pushdown — PushedAggregation in the DSv2 scan: COUNT/MIN/MAX answered from footer statistics, zero data pages"),
    ("k12_exchange_reuse", "exchange reuse — YoY self-join of the monthly aggregate: second branch is a ReusedExchange, the fact scans+shuffles ONCE"),
    ("a48_mann_whitney", "Mann-Whitney U — one map-combined shuffle to the ~50-key quantity grid; doubled-U fold and tie correction never touch row pairs"),
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # PLANS.md documents the at-scale plans, not the small-input tuning
    from smart_water_management_spark import registry

    registry.set_posture("production")
    spark = swm.get_session("plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence for the scale posture",
        "",
        "Generated by `tools/dump_plans.py` on the sf0.001 fixtures; asserted in",
        "CI by `tests/test_physical_plans.py`. Each plan is `explain('formatted')`",
        "output — the things to look for are called out per query.",
        "",
    ]
    for name, note in SHOW:
        df = _REGISTRY[name].fn(spark, sf)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if len(plan) > 4000:
            plan = plan[:4000] + "\n... (truncated; full plan via tools/dump_plans.py)"
        out += [f"## {name}", "", f"*{note}*", "", "```", plan, "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
