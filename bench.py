#!/usr/bin/env python
"""Benchmark harness (driver contract): run the engine's headline queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline set spans every operator family (scan/filter, agg, join,
window, dashboard SQL, validation, time windows, dedup, similarity, text)
so the number tracks whole-engine throughput, not one hot path. Each query
runs twice: the first pass is reported (cold-ish, includes planning), a
count() action forces full execution without collect-to-driver transfer
costs dominating.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

import smart_water_management_spark as swm

HEADLINE = [
    "a01_multi_agg_pricing",      # grouped multi-agg (TPC-H Q1 shape)
    "a14_rollup_grains",          # ROLLUP multi-grain
    "j03_star_join",              # star join
    "j09_asof_join",              # as-of join (union + carry-forward)
    "j10_range_join",             # bucketized range join
    "w02_range_rolling",          # multi-horizon RANGE windows
    "w06_rolling_zscore",         # rolling anomaly flags
    "q05_district_performance",   # dashboard SQL via spark.sql
    "v01_fused_validation",       # single-pass rule engine
    "t01_tumbling_hourly",        # tumbling windows
    "t03_sessionization",         # gaps-and-islands sessions
    "x05_exact_dedup",            # hash dedup
    "x08_minhash_lsh_dedup",      # MinHash+LSH near-dup
    "x10_bruteforce_cosine_topk", # similarity search
    "x01_token_stats",            # text analysis
    "p90_domain_pipeline",        # e2e domain fixture pipeline (BASELINE bar)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("swm-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = swm.queries()
    # Warm the JVM / codegen / parquet footer cache with one tiny untimed
    # action so the first timed query measures the engine, not startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
