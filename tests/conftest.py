"""Shared fixtures: one SparkSession per test session + the DuckDB oracle
comparator that mirrors the driver's correctness gate (row-count + schema
+ order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from smart_water_management_spark.session import get_session
from smart_water_management_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SWM_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_session("swm-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize to a (typeclass, value) tuple so the comparison is
    dtype-sensitive like the driver's value hash: int 1000 and float 1000.0
    must NOT compare equal (that exact class of oracle mismatch slipped
    through round 1 as a04/f03)."""
    if v is None:
        return None
    # numpy scalars → python
    if hasattr(v, "item"):
        return _norm(v.item())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, Decimal):
        return ("dec", v)
    if isinstance(v, (datetime, date)):
        return str(v)
    return v


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    recs = [tuple(_norm(v) for v in row) for row in df_pandas[cols].itertuples(index=False)]
    return cols, sorted(recs, key=lambda r: tuple((x is None, str(x)) for x in r))


def assert_oracle_match(spark_df, duck_con, sql, name=""):
    """Order-insensitive exact comparison of a Spark result vs DuckDB."""
    sp = spark_df.toPandas()
    du = duck_con.execute(sql).df()
    sp_cols, sp_rows = _rows(sp)
    du_cols, du_rows = _rows(du)
    assert [c.lower() for c in sp_cols] == [c.lower() for c in du_cols], (
        f"{name}: column mismatch spark={sp_cols} duck={du_cols}"
    )
    assert len(sp_rows) == len(du_rows), (
        f"{name}: row count spark={len(sp_rows)} duck={len(du_rows)}"
    )
    mismatches = []
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b:
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (spark vs duck): {mismatches}"
