#!/usr/bin/env python
"""Scale-trajectory probe behind the BASELINE.md dashboard-bench bar.

Replicates the sf0.1 events table 10x and 30x (new event/user ids, same
time span — denser traffic, more sensors: how the workload actually
grows) into a scratch dir with the other tables symlinked, then times
representative dashboard queries on Spark and DuckDB at each scale.
The point being measured: Spark's per-row cost FALLS with scale (fixed
job overhead + per-task launch amortize; columnar scan + codegen do the
work) while DuckDB's stays flat — i.e. local wall-clock ratios at MB
scale measure overhead, not engine throughput trajectory.

Usage: python tools/scale_probe.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import duckdb

import smart_water_management_spark as swm
from smart_water_management_spark.registry import _REGISTRY
from smart_water_management_spark.sources.catalog import TABLES

BASE = "/root/testdata/sf0.1"
SCRATCH = "/tmp/swm_scale_probe"
FACTORS = [1, 10, 30]
QUERIES = ["q01_total_readings_7d", "q05_district_performance", "q07_hourly_pattern"]
# LLM-data shapes on the replicated documents axis (both pin-free, so the
# timed passes pay the full tokenize/explode cost every rep)
DOC_QUERIES = ["x36_tile_dedup", "x25_repetition_detection"]
REPS = 3


def build_scale_dir(spark, factor: int, with_lineitem: bool = False) -> str:
    """``with_lineitem=True`` (the --parity mode) replicates lineitem
    AND embeddings too (a37/a42's scaled moments grow with lineitem's
    ROW COUNT and x127's micro-sums with embeddings', which symlinked
    copies would leave at 1x) and uses a separate scratch dir so the
    timing mode's symlink layout is never mixed with a replicated table
    of the same name."""
    if factor == 1:
        return BASE
    out = os.path.join(SCRATCH, f"x{factor}p" if with_lineitem else f"x{factor}")
    events_out = os.path.join(out, "events.parquet")
    docs_out = os.path.join(out, "documents.parquet")
    li_out = os.path.join(out, "lineitem.parquet")
    emb_out = os.path.join(out, "embeddings.parquet")
    replicated = ("events", "documents") + (
        ("lineitem", "embeddings", "orders") if with_lineitem else ()
    )
    # guard on ALL replicated outputs: an interrupted build (or a scratch
    # dir left by an older revision that only wrote events) must rebuild
    if not all(
        os.path.exists(os.path.join(out, f"{t}.parquet", "_SUCCESS"))
        for t in replicated
    ):
        os.makedirs(out, exist_ok=True)
        for t in TABLES:
            if t in replicated:
                continue
            link = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(os.path.join(BASE, "events.parquet"))
        n_events = raw.count()
        n_users = 1 + (raw.agg(F.max("user_id")).collect()[0][0] or 0)
        rep = (
            raw.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("event_id", F.col("event_id") + F.col("k") * F.lit(n_events))
            .withColumn("user_id", F.col("user_id") + F.col("k") * F.lit(n_users))
            .drop("k")
        )
        rep.write.mode("overwrite").parquet(events_out)
        # replicate documents with offset doc_ids (identical text: clone
        # groups are the WORST case for dedup-shaped queries — tile
        # groups of `factor` members — so the trajectory is conservative)
        docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        n_docs = 1 + (docs.agg(F.max("doc_id")).collect()[0][0] or 0)
        (
            docs.withColumn(
                "k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .withColumn("doc_id", F.col("doc_id") + F.col("k") * F.lit(n_docs))
            .drop("k")
            .write.mode("overwrite")
            .parquet(docs_out)
        )
        if with_lineitem:
            li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
            n_ord = 1 + (li.agg(F.max("l_orderkey")).collect()[0][0] or 0)
            (
                li.withColumn(
                    "k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.col("k") * F.lit(n_ord),
                )
                .drop("k")
                .write.mode("overwrite")
                .parquet(li_out)
            )
            emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
            n_vec = 1 + (emb.agg(F.max("vec_id")).collect()[0][0] or 0)
            (
                emb.withColumn(
                    "k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn(
                    "vec_id", F.col("vec_id") + F.col("k") * F.lit(n_vec)
                )
                .drop("k")
                .write.mode("overwrite")
                .parquet(emb_out)
            )
            # VERDICT r9 directive #8: replicate orders too, so
            # a47-class devices (year-grain trend sums over orders) get
            # true 30x row-volume coverage instead of a symlinked 1x
            ords = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
            n_okey = 1 + (ords.agg(F.max("o_orderkey")).collect()[0][0] or 0)
            (
                ords.withColumn(
                    "k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") + F.col("k") * F.lit(n_okey),
                )
                .drop("k")
                .write.mode("overwrite")
                .parquet(os.path.join(out, "orders.parquet"))
            )
    return out


def best_of(fn, reps=REPS):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def make_views(con, sf_dir: str, factor: int) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if t == "events" and factor != 1:
            # replicated events carry ts as epoch-nanos BIGINT when the
            # source generation was TIMESTAMP(NANOS) (read under
            # nanosAsLong), or as a plain TIMESTAMP otherwise — probe
            # the written dtype instead of assuming
            ts_type = con.execute(
                f"SELECT column_type FROM (DESCRIBE SELECT * FROM "
                f"'{path}/*.parquet') WHERE column_name = 'ts'"
            ).fetchone()[0]
            if ts_type == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{path}/*.parquet'"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'"
                )
        elif os.path.isdir(path) and not os.path.islink(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")


# VERDICT r7 directive #7: the float-exactness devices whose failure
# mode is data-VOLUME-dependent (scaled decimal moments past 2^53,
# 6-dp rounding midpoints, fold-state growth). sf1 fixtures don't
# exist, so 30x replication is the only 100x-direction signal.
PARITY_QUERIES = [
    "a37_spearman_corr",
    "w26_rolling_higher_moments",
    "m22_forecast_backtest",
    "x103_token_budget_waterfill",
    # round-8 float devices (VERDICT r8 directive #4)
    "a42_kendall_tau",             # DECIMAL(38,0) value-domain pair mass
    "m28_two_changepoint_trend",   # prefix-moment pair grid
    "m29_kaplan_meier",            # prefix-product survival folds
    "x127_embedding_mmd_matrix",   # integer micro-floor sums
    "x135_eval_quota_apportionment",  # largest-remainder integer DIV ties
    # round-9 float devices
    "a46_brown_forsythe",         # doubled-median BIGINT deviation sums
    "m36_multiple_regression",    # Cramer solve over decimal moments
    "w34_max_drawdown",           # all-decimal cum/runmax/dd windows
    "x146_domain_affinity_matrix",  # round-then-decimal-sum LN cells
    "a47_cochran_armitage",       # N-scaled integer trend numerator
    # round-10 devices: integer-exact, but their DEDUP semantics are
    # volume-dependent (clone groups grow to `factor` members) and
    # x151's height arithmetic rides the replicated doc_id domain
    "x151_jpeg_exif_audit",       # segment-walk fields vs doc_id arith
    "x152_audio_spectral_dedup",  # signature groups grow with factor
    # round-10 late-wave float devices (z formulas / fold over sums
    # whose integer pieces scale with row volume)
    "a48_mann_whitney",           # doubled-U decimals, tie-corrected z
    "a49_jonckheere_terpstra",    # grid-pair masses, HW tie variance
    "m38_theta_method",           # OLS+SES fold over 30x-larger hourly sums
    # round-11 devices (VERDICT r10 directive #8: extend to new devices)
    "a50_cliffs_delta",           # raw-quotient delta over BIGINT pair counts
    "m39_damped_holt",            # damped pair-fold over 30x-larger sums
    "a51_gamma_somers_tauc",      # grid pair counts + three ratio doubles
    "a52_mood_median_test",       # grand-median split + N-scaled chi-square
    "a53_ansari_bradley",         # doubled midrank scores, conditional z
    "m40_chow_test",              # segment SSEs over 30x-larger moments
    "m41_durbin_watson",          # integer-micro residual quantization
    "x157_norm_bound_prune_audit",  # raw-double bound vs kth-score compares
    "a54_dunn_posthoc",           # tie-mass decimal->double in the z scale
    "m42_forecast_metrics",       # round-then-decimal error sums, MASE ratio
    "x158_semantic_split_contamination",  # cosine folds + split joins at 30x
    "a55_cramer_von_mises",       # per-cell rounded doubles, BIGINT dv bound
    "m43_runs_test",              # micro-quantized residual signs at 30x
    "w37_aroon_indicator",        # packed-argmax decimal windows at 30x
    "j19_allen_relations",        # BIGINT interval compares at 30x volume
    "m44_pettitt_test",           # pair-sign diff array + EXP p at 30x
    "v23_simpsons_paradox_screen",  # decimal sign + mean-form slopes at 30x
    "x159_degenerate_loop_audit",   # island run folds over 30x documents
    "x160_good_turing_mass",      # freq-of-freq folds over 30x documents
    "a56_page_trend_test",        # doubled weekly ranks + inlined-constant z
    "w38_ulcer_index",            # once-rounded drawdown squares at 30x
    "a57_theil_uncertainty",      # once-rounded ln sums over 30x counts
    "v24_key_continuity_audit",   # two-level gap islands over 30x orders
    "x162_mcnemar_filter_audit",  # paired 2x2 cells over 30x documents
    "x163_cochran_q_filter_audit",  # k=3 matched-rater folds at 30x
    "m45_forecast_combination",   # combo MAEs over 30x-larger hourly sums
    "w39_chande_momentum",        # exact-decimal gain/loss frames at 30x
    "a58_anderson_darling",       # doubled-midrank cell terms at 30x
    "j20_overlap_allocation_join",  # once-rounded slice allocations at 30x
    "c22_pit_referential_audit",  # planted-defect match counts at 30x
]


def parity(factor: int = 30, only: list[str] | None = None) -> None:
    """Type-strict Spark-vs-DuckDB parity of the float-exactness
    devices at ``factor``x replication (the driver/replay protocol:
    int-vs-float tagged, rows sorted, exact compare). ``only`` (or
    ``--only a,b,c`` on the CLI) restricts to a subset — the per-op
    landing gate; the full list runs on the closing ladder."""
    import math
    from datetime import date, datetime

    def norm(v):
        if v is None:
            return None
        if hasattr(v, "item"):
            return norm(v.item())
        if isinstance(v, float):
            return ("float", "NaN" if math.isnan(v) else v)
        if isinstance(v, bool):
            return ("bool", v)
        if isinstance(v, int):
            return ("int", v)
        if isinstance(v, (datetime, date)):
            return str(v)
        return v

    spark = swm.get_session("scale-parity")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build_scale_dir(spark, factor, with_lineitem=True)
    con = duckdb.connect()
    make_views(con, sf_dir, factor)
    fails = []
    names = PARITY_QUERIES if not only else only
    unknown = [n for n in names if n not in PARITY_QUERIES]
    assert not unknown, f"--only names not in PARITY_QUERIES: {unknown}"
    for name in names:
        spec = _REGISTRY[name]
        sp = spec.fn(spark, sf_dir).toPandas()
        du = con.execute(spec.oracle).df()
        a = sorted(
            [tuple(norm(v) for v in r)
             for r in sp[sorted(sp.columns)].itertuples(index=False)],
            key=str,
        )
        b = sorted(
            [tuple(norm(v) for v in r)
             for r in du[sorted(du.columns)].itertuples(index=False)],
            key=str,
        )
        ok = a == b
        print(f"| {name} | {factor}x | {len(a)}/{len(b)} rows | "
              f"{'EXACT' if ok else 'MISMATCH'} |")
        if not ok:
            fails.append(name)
            for ra, rb in zip(a, b):
                if ra != rb:
                    print("   spark:", ra)
                    print("   duck :", rb)
                    break
    print("PARITY FAILED:", fails if fails else "none")
    con.close()
    spark.stop()


def main() -> None:
    spark = swm.get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | scale (rows: events or docs) | spark (s) | duckdb (s) "
          "| ratio | spark µs/row | duckdb µs/row |")
    print("|---|---|---|---|---|---|---|")
    for factor in FACTORS:
        sf_dir = build_scale_dir(spark, factor)
        con = duckdb.connect()
        make_views(con, sf_dir, factor)
        n = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
        n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
        for name in QUERIES + DOC_QUERIES:
            rows = n_docs if name in DOC_QUERIES else n
            spec = _REGISTRY[name]
            spec.fn(spark, sf_dir).collect()  # warm
            sp = best_of(lambda: spec.fn(spark, sf_dir).collect())
            du = best_of(lambda: con.execute(spec.oracle).fetchall())
            print(f"| {name} | {factor}x ({rows:,}) | {sp:.3f} | {du:.3f} "
                  f"| {sp / du:.1f}x | {sp / rows * 1e6:.2f} | {du / rows * 1e6:.3f} |")
        con.close()
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    if "--parity" in sys.argv:
        _i = sys.argv.index("--parity")
        _factor = (int(sys.argv[_i + 1])
                   if len(sys.argv) > _i + 1 and sys.argv[_i + 1].isdigit()
                   else 30)
        _only = (sys.argv[sys.argv.index("--only") + 1].split(",")
                 if "--only" in sys.argv else None)
        parity(_factor, _only)
    else:
        main()
