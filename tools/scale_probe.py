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


def build_scale_dir(spark, factor: int) -> str:
    if factor == 1:
        return BASE
    out = os.path.join(SCRATCH, f"x{factor}")
    events_out = os.path.join(out, "events.parquet")
    docs_out = os.path.join(out, "documents.parquet")
    # guard on BOTH replicated outputs: an interrupted build (or a scratch
    # dir left by an older revision that only wrote events) must rebuild
    if not (
        os.path.exists(os.path.join(events_out, "_SUCCESS"))
        and os.path.exists(os.path.join(docs_out, "_SUCCESS"))
    ):
        os.makedirs(out, exist_ok=True)
        for t in TABLES:
            if t in ("events", "documents"):
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
    return out


def best_of(fn, reps=REPS):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = swm.get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | scale (rows: events or docs) | spark (s) | duckdb (s) "
          "| ratio | spark µs/row | duckdb µs/row |")
    print("|---|---|---|---|---|---|---|")
    for factor in FACTORS:
        sf_dir = build_scale_dir(spark, factor)
        con = duckdb.connect()
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
            elif t == "documents" and factor != 1:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'"
                )
            else:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
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
    main()
