"""Skew- and layout-aware execution patterns (SURVEY.md §4.4).

Three techniques the 100 TB tier needs beyond AQE's automatics, each
registered with an exact oracle proving the optimized plan returns the
same rows as the naive one:

- **Salted two-phase aggregation**: when a group key has pathological
  skew (a handful of keys holding most rows), one reducer per hot key
  becomes the straggler. Salting fans each key across S partial groups,
  then a second (tiny) aggregation merges the partials. Works for any
  algebraic aggregate (sum/count/min/max and means derived from them).
- **Salted broadcast join** is unnecessary here (broadcast joins don't
  shuffle the big side at all — the preferred fix when one side fits);
  AQE skew-join handles the sort-merge case (session.py conf).
- **Bucketed co-located join**: pre-bucketing both tables on the join key
  at write time lets repeated joins run with ZERO exchanges — the
  physical-plan test asserts the absence of Exchange nodes. This is the
  Spark-native replacement for the reference warehouse's indexed FK joins
  (`sql/real_data_schema.sql:160-174`), paying one shuffle at layout time
  instead of one per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table

N_SALTS = 16


def salted_sum_count(
    df: DataFrame, key: str, value: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Two-phase skew-safe aggregation: (key, salt) partials → key finals.

    Phase 1 spreads each hot key over ``n_salts`` reducers; phase 2
    aggregates ``n_keys × n_salts`` partial rows — negligible at any
    scale. The salt hashes EVERY column (the row's full identity), not
    rand() and not just the value: a deterministic plan, and a hot key
    whose rows are near-identical in one column still spreads because the
    other columns differ.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(F.col(value).cast("decimal(27,6)")).alias("psum"),
        F.count("*").alias("pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("psum").cast("double").alias("total_value"),
        F.sum("pcnt").alias("n_rows"),
    )


@register(
    "k01_salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
    doc="salted two-phase aggregation over a 5-value hot key — identical "
    "result to the single-phase GROUP BY, no straggler reducer",
)
def k01_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event_type has ~5 distinct values over the whole table: the textbook
    # skew shape (every row lands on one of 5 reducers unsalted)
    ev = load_table(spark, sf_dir, "events")
    return salted_sum_count(ev, "event_type", "value")


def ensure_bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Lay out orders and lineitem bucketed by the join key (one-time
    shuffle at write; every subsequent equi-join on o_orderkey/l_orderkey
    is exchange-free). Returns the two table names."""
    from ..sources.catalog import reset_managed_table

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    ot, lt = f"orders_b_{tag}", f"lineitem_b_{tag}"
    for name, src, key in ((ot, "orders", "o_orderkey"), (lt, "lineitem", "l_orderkey")):
        if not spark.catalog.tableExists(name):
            # a prior session may have left the managed location behind
            # without its catalog entry; reset clears both
            reset_managed_table(spark, name)
            (
                load_table(spark, sf_dir, src)
                .write.bucketBy(n_buckets, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(name)
            )
    return ot, lt


@register(
    "k03_dynamic_partition_pruning",
    oracle="""
    WITH cnt AS (
      SELECT EXTRACT(year FROM o_orderdate) AS year, COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    dim AS (SELECT year FROM cnt ORDER BY n DESC, year DESC LIMIT 2)
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
             AS revenue
    FROM orders JOIN dim ON EXTRACT(year FROM o_orderdate) = dim.year
    GROUP BY 1
    """,
    doc="runtime (dynamic) partition pruning: a year-partitioned fact "
    "joined to a dim whose filter is only known at runtime (top-2 years "
    "by order count) — the fact scan reads 2 of 7 partitions, with "
    "dynamicpruningexpression in PartitionFilters (plan-asserted). At "
    "100 TB this is the difference between scanning the whole fact table "
    "and scanning only the partitions the dim selects",
)
def k03_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = ensure_year_partitioned_orders(spark, sf_dir)
    # the dim's predicate (rank by count) is NOT statically inferable onto
    # the fact side — Catalyst cannot constant-fold it, so only DPP's
    # runtime subquery can prune the fact partitions
    from pyspark.sql import Window

    cnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("year"))
        .count()
    )
    w = Window.orderBy(F.desc("count"), F.desc("year"))
    dim = cnt.withColumn("rk", F.row_number().over(w)).filter("rk <= 2").select("year")
    return (
        fact.join(dim, fact.o_year == dim.year)
        .groupBy(fact.o_year)
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def ensure_year_partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lay orders out as a year-partitioned parquet fact (o_year=YYYY
    directories — SURVEY §4.4 layout) and return the scan over it."""
    from ..sources.io_ops import _scratch

    path = _scratch("k03_fact", sf_dir)
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    return spark.read.parquet(path)


@register(
    "k02_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="co-located join on pre-bucketed tables: zero Exchange in the "
    "join (plan-asserted) — layout-time shuffle amortized across queries",
)
def k02_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ot, lt = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(ot)
    line = spark.table(lt)
    # disable broadcast for THIS join so the bucketed sort-merge path is
    # what's exercised (broadcast would hide the layout win at test scale)
    joined = o.hint("merge").join(
        line, o.o_orderkey == line.l_orderkey
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("total_price"),
    )
