"""Central query registry: the single source of truth for the engine's
checkable query surface.

Every operator implemented from SURVEY.md §2 registers here as a
``QuerySpec``: a name, a PySpark callable ``(spark, sf_dir) -> DataFrame``,
and (when SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB
can run over the same parquet tables. ``__spark_entry__.py`` exposes this
registry to the verification driver.

Design note (determinism): the driver compares Spark vs DuckDB results via
an order-insensitive value hash. Floating-point aggregates computed in
different orders differ in the last ulp, so money-style sums/avgs/stddevs
in registered queries go through the exact-decimal helpers in
``functions.numeric`` (sum as DECIMAL — exact and order-independent — then
cast to double). Both engines then produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in sorted(_REGISTRY.items()) if s.oracle is not None}


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]
