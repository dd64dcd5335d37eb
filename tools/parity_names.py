#!/usr/bin/env python
"""Targeted DuckDB-oracle parity check for a set of query names.

The optimization-round gate: every restructured query re-proves against
its oracle at each SF before landing (same comparator as the driver's
correctness gate / tests/conftest.py).

Usage: python tools/parity_names.py name1,name2 [sf_dir ...]
       (default sf_dirs: sf0.001 sf0.01 sf0.1)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import duckdb  # noqa: E402

from smart_water_management_spark.session import get_session  # noqa: E402
from smart_water_management_spark.sources.catalog import TABLES  # noqa: E402
from smart_water_management_spark.registry import _REGISTRY  # noqa: E402

sys.path.insert(0, os.path.join(ROOT, "tests"))
from conftest import assert_oracle_match  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    names = [n for n in sys.argv[1].split(",") if n]
    unknown = [n for n in names if n not in _REGISTRY]
    if unknown:
        print(f"unknown query names: {unknown}")
        sys.exit(2)
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_session("parity-names")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            spec = _REGISTRY[name]
            if spec.oracle is None:
                print(f"SKIP (rows-only) {name}")
                continue
            try:
                assert_oracle_match(
                    spec.fn(spark, sf_dir), con, spec.oracle, name=name
                )
                print(f"OK   {sf_dir.rsplit('/',1)[-1]} {name}", flush=True)
            except Exception as e:  # record and continue the sweep —
                # a runtime error in one query must not hide the
                # verdicts of the remaining names (ADVICE r11)
                failed.append((sf_dir, name))
                print(f"FAIL {sf_dir} {name}: {e}", flush=True)
        con.close()
    if failed:
        sys.exit(1)
    print("ALL GREEN")


if __name__ == "__main__":
    main()
