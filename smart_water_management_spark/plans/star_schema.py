"""Star-schema / warehouse operators (SURVEY.md §2.13 C1-C8).

Reference: the PostgreSQL star schema (sql/dimensional_schema.sql:9-117,
sql/real_data_schema.sql:19-153) loaded by row-wise pandas code
(src/warehouse_loader.py:149-292). Here the warehouse IS Spark: dimensions
are extracted set-based with surrogate keys, the time dimension is
generated with sequence(), facts resolve FKs via equi-joins, and "views"
are temp views over the session catalog.

Scale posture: dimension builds are tiny (distinct + row_number over a
singleton window is fine at any fact size because it runs on the already-
deduped dimension rows); fact FK-resolution joins broadcast the dims so
the 100 TB fact table never shuffles. SCD2 is expressed as the
anti-join + union merge pattern (no Delta dependency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.numeric import sql_dsum
from ..registry import register
from ..sources.catalog import load_table


def build_time_dimension(spark: SparkSession, start: str, end: str) -> DataFrame:
    """C2: generated calendar dimension (reference src/warehouse_loader.py:80-119
    builds 731 rows in pandas; here one sequence() expression, 15 attributes)."""
    d = F.col("date_actual")
    mo = F.month(d)
    return (
        spark.sql(
            f"SELECT explode(sequence(date'{start}', date'{end}')) AS date_actual"
        )
        .select(
            F.date_format(d, "yyyyMMdd").cast("int").alias("time_key"),
            d,
            F.year(d).alias("year"),
            F.quarter(d).alias("quarter"),
            mo.alias("month"),
            F.weekofyear(d).alias("week_of_year"),
            F.dayofmonth(d).alias("day_of_month"),
            F.dayofweek(d).alias("day_of_week"),
            F.date_format(d, "EEEE").alias("day_name"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.dayofweek(d).isin([1, 7]).alias("is_weekend"),
            (~F.dayofweek(d).isin([1, 7])).alias("is_business_day"),
            F.when(mo.isin(12, 1, 2), "winter")
            .when(mo.isin(3, 4, 5), "spring")
            .when(mo.isin(6, 7, 8), "summer")
            .otherwise("autumn")
            .alias("season"),
            F.when(mo >= 4, F.year(d) + 1).otherwise(F.year(d)).alias("fiscal_year"),
            (((mo + 8) % 12 / 3).cast("int") + 1).alias("fiscal_quarter"),
        )
    )


def surrogate_key(df: DataFrame, order_col: str, n_buckets: int = 256):
    """Dense deterministic surrogate key 1..N for an arbitrarily LARGE
    dimension, without the single-partition global window a naive
    ``row_number().over(orderBy(...))`` costs (at 100 TB a billion-row
    customer dim on one task is a scale killer). Two-phase bucketed rank:

    1. hash-bucket each row (xxhash64 of the natural key — internal only,
       never compared cross-engine),
    2. rank WITHIN each bucket (partitioned window — parallel),
    3. cumsum the 256 bucket counts (a window over 256 rows) into
       offsets, broadcast them back, key = offset + in-bucket rank.

    Deterministic for any partitioning (pure function of the natural
    key), unique and dense, and the only global ordering touches
    n_buckets rows. The equivalent of RDD ``zipWithIndex`` expressed in
    DataFrame ops."""
    b = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_buckets)).alias("_skb")
    ranked = df.withColumn("_skb", b).withColumn(
        "_skr",
        F.row_number().over(W.partitionBy("_skb").orderBy(order_col)),
    )
    offsets = (
        ranked.groupBy("_skb")
        .count()
        .withColumn(
            "_sko",
            F.coalesce(
                F.sum("count").over(
                    W.orderBy("_skb").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_skb", "_sko")
    )
    return (
        ranked.join(F.broadcast(offsets), "_skb")
        .withColumn("_sk", (F.col("_sko") + F.col("_skr")).cast("long"))
        .drop("_skb", "_skr", "_sko")
    )


def build_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """C1/C3: extract dimensions with surrogate keys and resolve fact FKs
    set-based — the engine replacement for the reference's O(n·m) iterrows
    fact load (src/warehouse_loader_real_data.py:192-251).

    Key assignment is size-aware: dim_geo (≤25 nations, bounded by the
    world) takes the simple global row_number; dim_customer — the dim
    that actually grows with the business — uses the bucketed
    ``surrogate_key`` so no single task ever sorts the whole dim."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    dim_geo = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .select(
            F.col("n_nationkey").alias("nation_id"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
        .withColumn("geo_key", F.row_number().over(W.orderBy("nation_name")))
    )
    dim_customer = surrogate_key(
        c.select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation_id"),
        ),
        "customer_id",
    ).withColumnRenamed("_sk", "customer_key")
    dim_time = build_time_dimension(spark, "1995-01-01", "2001-12-31")
    fact = (
        o.join(F.broadcast(dim_customer), o.o_custkey == dim_customer.customer_id)
        .join(F.broadcast(dim_geo), "nation_id")
        .join(
            F.broadcast(dim_time),
            F.to_date("o_orderdate") == dim_time.date_actual,
        )
        .select(
            F.col("o_orderkey").alias("order_id"),
            "customer_key",
            "geo_key",
            "time_key",
            F.col("o_totalprice").alias("total_price"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    return {
        "dim_geo": dim_geo,
        "dim_customer": dim_customer,
        "dim_time": dim_time,
        "fact_orders": fact,
    }


# --- C2 as a checkable query.
@register(
    "c02_time_dimension",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS time_key,
           strftime(d, '%Y-%m-%d') AS day,
           CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
           CAST(month(d) AS INT) AS month,
           CAST(weekofyear(d) AS INT) AS week_of_year,
           CAST(day(d) AS INT) AS day_of_month,
           CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
           dayname(d) AS day_name, monthname(d) AS month_name,
           CASE WHEN dayofweek(d) IN (0, 6) THEN TRUE ELSE FALSE END AS is_weekend,
           CASE WHEN month(d) IN (12,1,2) THEN 'winter'
                WHEN month(d) IN (3,4,5) THEN 'spring'
                WHEN month(d) IN (6,7,8) THEN 'summer'
                ELSE 'autumn' END AS season,
           CAST(CASE WHEN month(d) >= 4 THEN year(d) + 1 ELSE year(d) END AS INT) AS fiscal_year,
           CAST(floor((month(d) + 8) % 12 / 3) + 1 AS INT) AS fiscal_quarter
    FROM generate_series(DATE '2024-01-01', DATE '2025-12-31', INTERVAL 1 DAY) t(d)
    """,
    doc="C2: 731-row generated time dimension with 14 calendar attributes",
)
def c02_time_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = build_time_dimension(spark, "2024-01-01", "2025-12-31")
    return dim.select(
        "time_key",
        F.date_format("date_actual", "yyyy-MM-dd").alias("day"),
        "year",
        "quarter",
        "month",
        "week_of_year",
        "day_of_month",
        "day_of_week",
        "day_name",
        "month_name",
        "is_weekend",
        "season",
        "fiscal_year",
        "fiscal_quarter",
    )


# --- C3+C6: gold view over the built star (the reference's
# v_district_performance sql/real_data_schema.sql:202-219 analog).
@register(
    "c03_star_gold_view",
    oracle="""
    WITH dim_geo AS (
      SELECT n.n_nationkey AS nation_id, n.n_name AS nation_name, r.r_name AS region_name,
             ROW_NUMBER() OVER (ORDER BY n.n_name) AS geo_key
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT g.region_name, g.nation_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN dim_geo g ON c.c_nationkey = g.nation_id
    GROUP BY g.region_name, g.nation_name
    """,
    doc="C3/C6: star build + surrogate keys + gold rollup view",
)
def c03_star_gold_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    star = build_star(spark, sf_dir)
    fact, geo = star["fact_orders"], star["dim_geo"]
    from ..functions.numeric import dsum

    return (
        fact.join(F.broadcast(geo), "geo_key")
        .groupBy("region_name", "nation_name")
        .agg(F.count("*").alias("n_orders"), dsum("total_price").alias("revenue"))
    )


# C4: SCD Type 2 merge lives in plans/scd.py (scd2_merge) — one
# implementation, null-safe change detection. This module previously
# carried a duplicate with null-unsafe semantics; consolidated there.


@register(
    "c05_quantile_thresholds",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_readings,
           ROUND(quantile_cont(value, 0.5), 6) AS p50_value,
           ROUND(quantile_cont(value, 0.95), 6) AS p95_threshold,
           ROUND(quantile_cont(value, 0.99), 6) AS p99_threshold
    FROM events
    GROUP BY event_type
    """,
    doc="C5: exact quantile-derived alert thresholds per sensor type, the "
    "dim_sensor_types enrichment (reference src/warehouse_loader.py:161-166 "
    "computes these in pandas; here one grouped percentile pass — swap to "
    "percentile_approx at the 100 TB tier)",
)
def c05_quantile_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_readings"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_value"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_threshold"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99_threshold"),
    )


# --- c11 (ext.): native recursive CTE over the dimension hierarchy ----------
# Spark 4 ships WITH RECURSIVE (UNION ALL form). The engine's iterative
# dataflow closures (x15 label propagation, x60 PageRank) predate it and
# remain the scale path for cyclic graphs — Spark's rCTE rejects
# UNION-distinct recursion, which cycle closure needs — but for acyclic
# hierarchy walks (org charts, BOM explosions, dimension rollup paths)
# the native operator is the idiomatic expression, and this query proves
# it end-to-end against DuckDB running the very same recursion.
_C11_WALK = """
WITH RECURSIVE walk(node, root_region, depth) AS (
  SELECT 'R' || CAST(r_regionkey AS {str_t}), r_name, 0 FROM region
  UNION ALL
  SELECT e.dst, w.root_region, w.depth + 1
  FROM walk w JOIN hier_edges e ON e.src = w.node
)
SELECT root_region, depth,
       COUNT(*) AS n_nodes,
       MIN(node) AS first_node,
       MAX(node) AS last_node
FROM walk
GROUP BY root_region, depth
"""

_C11_EDGES = """
SELECT 'R' || CAST(n_regionkey AS {str_t}) AS src,
       'N' || CAST(n_nationkey AS {str_t}) AS dst
FROM nation
UNION ALL
SELECT 'N' || CAST(c_nationkey AS {str_t}) AS src,
       'C' || CAST(c_custkey AS {str_t}) AS dst
FROM customer
"""


@register(
    "c11_recursive_hierarchy",
    oracle=(
        "WITH RECURSIVE hier_edges AS ("
        + _C11_EDGES.format(str_t="VARCHAR")
        + "), "
        + _C11_WALK.format(str_t="VARCHAR").replace("WITH RECURSIVE ", "", 1)
    ),
    doc="c11 (ext.): NATIVE Spark 4 WITH RECURSIVE — walk the "
    "region→nation→customer dimension DAG from the roots, tracking root "
    "and depth (the org-chart / BOM-explosion shape). Oracle runs the "
    "identical recursion in DuckDB. Scale: each recursion step is one "
    "co-partitioned join on the frontier; depth bounds the iteration "
    "count, and the frontier (not the closure) is the working set",
)
def c11_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("region", "nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.sql(_C11_EDGES.format(str_t="STRING")).createOrReplaceTempView("hier_edges")
    return spark.sql(_C11_WALK.format(str_t="STRING"))


# --- c14 (ext.): foreign-key discovery ----------------------------------------

# Candidate (child, parent) column pairs to profile — the schema-inference
# sweep a warehouse bootstrap runs over an undocumented landing zone.
# Includes the four true FKs, one reversed pair (low containment) and one
# cross-domain impostor (events.user_id vs c_custkey) as negative
# controls, so the query's verdict column actually discriminates.
_C14_CANDIDATES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
]
_C14_THRESHOLD = 0.999


def _c14_oracle() -> str:
    blocks = []
    for ct, cc, pt, pc in _C14_CANDIDATES:
        blocks.append(f"""
    SELECT '{ct}.{cc}' AS child_col, '{pt}.{pc}' AS parent_col,
           (SELECT COUNT(DISTINCT {cc}) FROM {ct}) AS n_child_keys,
           (SELECT COUNT(DISTINCT {pc}) FROM {pt}) AS n_parent_keys,
           (SELECT COUNT(*) FROM
              (SELECT DISTINCT {cc} FROM {ct} WHERE {cc} IS NOT NULL) c
            WHERE c.{cc} NOT IN (SELECT {pc} FROM {pt} WHERE {pc} IS NOT NULL))
             AS n_orphan_keys""")
    inner = "\n    UNION ALL\n".join(blocks)
    return f"""
    SELECT child_col, parent_col,
           CAST(n_child_keys AS BIGINT) AS n_child_keys,
           CAST(n_parent_keys AS BIGINT) AS n_parent_keys,
           CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys,
           ROUND(1.0 - CAST(n_orphan_keys AS DOUBLE) / n_child_keys, 6)
             AS containment,
           1.0 - CAST(n_orphan_keys AS DOUBLE) / n_child_keys
             >= {_C14_THRESHOLD} AS inferred_fk
    FROM ({inner})
    """


@register(
    "c14_fk_discovery",
    oracle=_c14_oracle(),
    doc="c14 (ext.): foreign-key DISCOVERY — the inverse of v08's "
    "referential-integrity check: profile candidate (child, parent) key "
    "pairs (the four true FKs plus a reversed pair and a cross-domain "
    "impostor as negative controls) by distinct-key containment, and "
    "infer FK where containment >= 99.9%. The schema-inference sweep a "
    "warehouse bootstrap runs over an undocumented landing zone. "
    "Exactness: pure integer counts + one quotient. Scale: each pair "
    "is DISTINCT (map-combined) then LEFT ANTI on the parent's "
    "distinct keys — set-sized exchanges, never row-sized; candidate "
    "pairs are metadata, so the sweep parallelizes per pair",
)
def c14_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for ct, cc, pt, pc in _C14_CANDIDATES:
        child = (
            load_table(spark, sf_dir, ct)
            .select(F.col(cc).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        parent = (
            load_table(spark, sf_dir, pt)
            .select(F.col(pc).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        orphans = child.join(parent, "k", "left_anti")
        row = (
            child.agg(F.count("*").alias("n_child_keys"))
            .crossJoin(parent.agg(F.count("*").alias("n_parent_keys")))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphan_keys")))
            .select(
                F.lit(f"{ct}.{cc}").alias("child_col"),
                F.lit(f"{pt}.{pc}").alias("parent_col"),
                F.col("n_child_keys").cast("bigint"),
                F.col("n_parent_keys").cast("bigint"),
                F.col("n_orphan_keys").cast("bigint"),
            )
        )
        out = row if out is None else out.unionByName(row)
    cont = 1.0 - F.col("n_orphan_keys").cast("double") / F.col("n_child_keys")
    return out.select(
        "child_col",
        "parent_col",
        "n_child_keys",
        "n_parent_keys",
        "n_orphan_keys",
        F.round(cont, 6).alias("containment"),
        (cont >= _C14_THRESHOLD).alias("inferred_fk"),
    )


# --- c16 (ext.): right-to-be-forgotten delete + completeness audit --------------


@register(
    "c16_forget_user",
    # GDPR-style erasure over an immutable parquet lake: rewrite the
    # managed copy WITHOUT the forget-set (anti-join — the rewrite
    # pattern deletion vectors amortize), then AUDIT the erasure:
    # zero remaining rows for forgotten users, and surviving
    # rows + checksum reconcile exactly with the source complement.
    oracle="""
    WITH forget AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 17 = 3
    ),
    kept AS (
      SELECT e.* FROM events e LEFT JOIN forget f USING (user_id)
      WHERE f.user_id IS NULL
    )
    SELECT CAST((SELECT COUNT(*) FROM forget) AS BIGINT)
             AS n_forgotten_users,
           CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_rows_before,
           CAST(COUNT(*) AS BIGINT) AS n_rows_after,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
             AS kept_value_checksum,
           CAST(0 AS BIGINT) AS n_leaked_rows,
           TRUE AS erasure_complete
    FROM kept
    """,
    doc="c16 (ext.): right-to-be-forgotten — delete every event of a "
    "forget-set of users (user_id % 17 = 3, the deterministic stand-in "
    "for a DSAR list) by anti-join rewrite of the managed copy, then "
    "audit the erasure by RE-READING the sink: zero leaked rows for "
    "forgotten users, surviving count + exact decimal checksum "
    "reconciling with the source complement. The compliance op every "
    "lake needs; at 100 TB the same anti-join runs partition-wise and "
    "deletion vectors amortize the rewrite — the AUDIT query is "
    "identical either way. Scale: forget-set is DISTINCT user ids "
    "(set-sized broadcast), one rewrite scan, one audit scan of the "
    "rewritten sink",
)
def c16_forget_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io_ops import _scratch

    ev = load_table(spark, sf_dir, "events")
    forget = (
        ev.filter(F.col("user_id") % 17 == 3).select("user_id").distinct()
    )
    path = _scratch("c16_forgotten", sf_dir)
    kept = ev.join(F.broadcast(forget), "user_id", "left_anti")
    kept.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    audit = back.agg(
        F.count("*").cast("bigint").alias("n_rows_after"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("kept_value_checksum"),
    )
    leaked = (
        back.join(F.broadcast(forget), "user_id", "left_semi")
        .agg(F.count("*").cast("bigint").alias("n_leaked_rows"))
    )
    before = ev.agg(F.count("*").cast("bigint").alias("n_rows_before"))
    nf = forget.agg(F.count("*").cast("bigint").alias("n_forgotten_users"))
    return (
        audit.crossJoin(F.broadcast(leaked))
        .crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(nf))
        .select(
            "n_forgotten_users",
            "n_rows_before",
            "n_rows_after",
            "kept_value_checksum",
            "n_leaked_rows",
            (F.col("n_leaked_rows") == 0).alias("erasure_complete"),
        )
    )


# --- c18 (ext.): late-arriving dimension (unknown member + backfill) -------------------


@register(
    "c18_late_arriving_dimension",
    # The warehouse pattern for facts that land before their dimension
    # row: conform against the dimension AS OF load time (a lagging
    # feed, simulated as every 5th customer missing), park unmatched
    # facts on the UNKNOWN member, then re-attribute them when the
    # full dimension arrives. Emits per nation how much fact mass was
    # matched first-pass vs recovered by the backfill — the audit that
    # proves no revenue is lost or double-counted across the two
    # passes. Exactness: integer counts + decimal revenue sums.
    oracle=f"""
    WITH v0 AS (
      SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 5 <> 0
    ),
    conform AS (
      SELECT o.o_totalprice,
             v0.c_custkey AS k0,
             c.c_nationkey AS nk1
      FROM orders o
      LEFT JOIN v0 ON v0.c_custkey = o.o_custkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT n.n_name,
           CAST(SUM(CASE WHEN k0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           CAST(SUM(CASE WHEN k0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backfilled,
           {sql_dsum('CASE WHEN k0 IS NOT NULL THEN o_totalprice END')}
             AS matched_revenue,
           {sql_dsum('CASE WHEN k0 IS NULL THEN o_totalprice END')}
             AS backfilled_revenue
    FROM conform JOIN nation n ON n.n_nationkey = nk1
    GROUP BY n.n_name
    """,
    doc="c18 (ext.): late-arriving dimension handling — facts conformed "
    "against a lagging dimension feed take the UNKNOWN surrogate "
    "(-1) instead of being dropped, and a backfill pass re-attributes "
    "them once the dimension lands; the audit shows first-pass vs "
    "recovered mass per nation, proving conservation across passes. "
    "Completes the c03 surrogate-key + c08 SCD2 story with the "
    "out-of-order-arrival case every 100 TB ingest hits (the "
    "alternative — inner-joining facts to dims — silently drops "
    "late rows). Both dimension probes are broadcast hash joins on "
    "the fact; no extra shuffle. Ref parity: FK-resolution ETL "
    "(src/etl.py:55-78) extended with the missing-member branch",
)
def c18_late_arriving_dimension(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    dec = F.col("o_totalprice").cast("decimal(27,6)")
    # The lagging feed's membership (v0 = every key not divisible by 5)
    # is a pure predicate on the surrogate key, so the unknown-member
    # flag rides the single dimension join instead of a second probe
    # (also sidesteps Spark's ambiguous-self-join analyzer on the
    # pinned customer scan). k0 mirrors the oracle's LEFT JOIN v0 key.
    conform = (
        o.withColumn(
            "k0",
            F.when(F.col("o_custkey") % 5 != 0, F.col("o_custkey")),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    matched = F.col("k0").isNotNull()
    return conform.groupBy("n_name").agg(
        F.sum(F.when(matched, 1).otherwise(0)).cast("bigint").alias("n_matched"),
        F.sum(F.when(~matched, 1).otherwise(0))
        .cast("bigint")
        .alias("n_backfilled"),
        F.sum(F.when(matched, dec)).cast("double").alias("matched_revenue"),
        F.sum(F.when(~matched, dec)).cast("double").alias("backfilled_revenue"),
    )
