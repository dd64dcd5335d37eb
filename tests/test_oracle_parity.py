"""Run every registered query against its DuckDB oracle at the test SF —
the local mirror of the driver's CORRECTNESS gate. Queries without an
oracle get a rows-run smoke check (schema resolves, plan executes)."""

from __future__ import annotations

import pytest

import smart_water_management_spark as swm
from smart_water_management_spark.registry import _REGISTRY

from .conftest import SF_DIR, assert_oracle_match

ALL = sorted(_REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, duck, name):
    spec = _REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        rows = df.limit(5000).collect()
        assert rows is not None  # plan executes
    else:
        assert_oracle_match(df, duck, spec.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(swm.oracle_sql()).issubset(set(swm.queries()))
