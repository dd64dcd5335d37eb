"""Relational core: projections, filters, predicates (SURVEY.md §2.2),
sorts/limits/top-k (§2.6), and set operations (§2.7).

Reference sites: projection/derived cols src/spark_etl.py:71-99; BETWEEN /
IN / range predicates src/enhanced_spark_etl.py:213-225,735-737; CASE WHEN
classification chains :216-225 and src/app.py:115-120; null handling
src/etl.py:65, src/spark_etl.py:208; top-k src/enhanced_spark_etl.py:683-702;
unions :427-430, pd.concat src/enhanced_ingestion.py:485.

Catalyst notes: the filters here compile to pushed parquet predicates
(check `.explain`: PushedFilters) and the top-k queries to
TakeOrderedAndProject — no full sort at scale. Deterministic top-k always
carries a unique key as tiebreaker so LIMIT is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


# --- P1/P2/P5-P8: projection + compound predicates (pushdown-friendly).
@register(
    "p01_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND (l_discount < 0.03 OR l_tax > 0.05)
    """,
    doc="P1/P5-P8: projection with BETWEEN/IN/range/OR predicates (pushdown)",
)
def p01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & ((F.col("l_discount") < 0.03) | (F.col("l_tax") > 0.05))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# --- P11: CASE WHEN classification chains (time_of_day + season + grade —
# reference src/spark_etl.py:80-84, src/enhanced_spark_etl.py:216-225 and the
# when-chain re-expression of UDFs F1/F2 per SURVEY §2.12).
@register(
    "p02_case_when_bands",
    oracle="""
    SELECT CASE WHEN hour(ts) BETWEEN 6 AND 9 THEN 'morning_peak'
                WHEN hour(ts) BETWEEN 10 AND 16 THEN 'daytime'
                WHEN hour(ts) BETWEEN 17 AND 21 THEN 'evening_peak'
                ELSE 'night' END AS time_of_day,
           CASE WHEN value >= 400 THEN 'critical'
                WHEN value >= 200 THEN 'high'
                WHEN value >= 50 THEN 'normal'
                ELSE 'low' END AS value_band,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc="P11/F1/F2: when-chain classification (UDF-free consumption pattern)",
)
def p02_case_when_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    time_of_day = (
        F.when(h.between(6, 9), "morning_peak")
        .when(h.between(10, 16), "daytime")
        .when(h.between(17, 21), "evening_peak")
        .otherwise("night")
    )
    band = (
        F.when(F.col("value") >= 400, "critical")
        .when(F.col("value") >= 200, "high")
        .when(F.col("value") >= 50, "normal")
        .otherwise("low")
    )
    return ev.groupBy(
        time_of_day.alias("time_of_day"), band.alias("value_band")
    ).agg(F.count("*").alias("n_events"))


# --- P9/P12-P14: null predicates, drop/fill/coalesce (nulls synthesized via
# NULLIF since the testdata is clean — reference src/etl.py:65, spark_etl.py:208).
@register(
    "p03_null_handling",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id,
             NULLIF(value, 0.0) AS v_nullable,
             CASE WHEN value < 50 THEN NULL ELSE value END AS v_high
      FROM events
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(v_high) AS n_high_nonnull,
           CAST(SUM(CASE WHEN v_high IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_null,
           COUNT(COALESCE(v_high, v_nullable)) AS n_coalesced,
           CAST(SUM(CASE WHEN COALESCE(v_high, 0.0) = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_filled_zero
    FROM t
    """,
    doc="P9/P12-P14: isNull counting, coalesce, fillna semantics",
)
def p03_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        "user_id",
        F.nullif(F.col("value"), F.lit(0.0)).alias("v_nullable"),
        F.when(F.col("value") < 50, None).otherwise(F.col("value")).alias("v_high"),
    )
    return t.agg(
        F.count("*").alias("n_rows"),
        F.count("v_high").alias("n_high_nonnull"),
        F.sum(F.when(F.col("v_high").isNull(), 1).otherwise(0)).alias("n_high_null"),
        F.count(F.coalesce("v_high", "v_nullable")).alias("n_coalesced"),
        F.sum(
            F.when(F.coalesce(F.col("v_high"), F.lit(0.0)) == 0.0, 1).otherwise(0)
        ).alias("n_filled_zero"),
    )


# --- P10: regex predicate (reference src/data_validator.py:58-61 sensor-id
# format check → rlike).
@register(
    "p04_regex_filter",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN regexp_matches(p_name, '^[a-z]+ [a-z]+') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_two_words
    FROM part
    WHERE regexp_matches(p_brand, '^Brand#[0-9]+$')
    GROUP BY p_brand
    """,
    doc="P10: rlike regex format validation as filter + conditional count",
)
def p04_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_brand").rlike(r"^Brand#[0-9]+$"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(
                F.when(F.col("p_name").rlike(r"^[a-z]+ [a-z]+"), 1).otherwise(0)
            ).alias("n_two_words"),
        )
    )


# --- O1/O2/O3: order-by + top-k / bottom-k (reference
# src/enhanced_spark_etl.py:683-702). Unique-key tiebreak keeps LIMIT stable.
@register(
    "o01_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="O1/O2: top-k via orderBy desc + limit (TakeOrderedAndProject)",
)
def o01_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "o02_bottomk_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal ASC, c_custkey ASC
    LIMIT 10
    """,
    doc="O3: bottom-k via orderBy asc + limit",
)
def o02_bottomk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )


# --- U1/U2: union by name, incl. heterogeneous schemas
# (reference src/enhanced_spark_etl.py:427-430; pd.concat of mixed frames
# src/enhanced_ingestion.py:485 → unionByName(allowMissingColumns)).
@register(
    "u01_union_by_name",
    oracle="""
    SELECT src, key_id, amount, COUNT(*) AS n FROM (
      SELECT 'orders' AS src, o_orderkey AS key_id, o_totalprice AS amount, NULL AS extra
      FROM orders WHERE o_totalprice > 300000
      UNION ALL
      SELECT 'events' AS src, event_id AS key_id, value AS amount, event_type AS extra
      FROM events WHERE value > 400
    )
    GROUP BY src, key_id, amount
    """,
    doc="U1/U2: unionByName with missing-column fill across heterogeneous inputs",
)
def u01_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    a = o.filter(F.col("o_totalprice") > 300000).select(
        F.lit("orders").alias("src"),
        F.col("o_orderkey").alias("key_id"),
        F.col("o_totalprice").alias("amount"),
    )
    b = ev.filter(F.col("value") > 400).select(
        F.lit("events").alias("src"),
        F.col("event_id").alias("key_id"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("extra"),
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .groupBy("src", "key_id", "amount")
        .agg(F.count("*").alias("n"))
    )


# --- U3+: row-level intersect / except (engine surface beyond the
# reference's schema-level set diff src/data_validator.py:197-229).
@register(
    "u02_intersect_except",
    oracle="""
    SELECT 'both' AS which, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'only_purchase' AS which, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    """,
    doc="U3: INTERSECT / EXCEPT row-level set operations",
)
def u02_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    errs = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = buyers.intersect(errs).select(F.lit("both").alias("which"), "user_id")
    only = buyers.exceptAll(errs).select(
        F.lit("only_purchase").alias("which"), "user_id"
    )
    return both.unionByName(only)


# --- V9 + dedup: keyed duplicate detection and deterministic dedup
# (reference src/data_validator.py:406-415 counts dupes on (sensor_id, ts);
# src/etl.py:62 drops full-row dupes; dedup keeps max event_id per key).
@register(
    "d01_keyed_dedup",
    oracle="""
    WITH ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id, value
    FROM ranked WHERE rn = 1
    """,
    doc="V9/A10: deterministic keyed dedup — keep latest row per key",
)
def d01_keyed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@register(
    "p05_stratified_sample",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_sampled
    FROM events
    WHERE event_type = 'error' AND event_id % 10 < 8
    GROUP BY event_type
    """,
    doc="stratified sampling for class rebalancing — identity-gated "
    "per-stratum fractions, deterministic at any partitioning (a "
    "training-data pipeline's downsampling stage; rand()-based sample() "
    "is not partition-stable)",
)
def p05_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep 80% of the 'error' class, drop every other stratum.

    The per-stratum keep-fraction is a gate on the row's stable identity
    (`event_id % 10 < fraction*10`; with no natural key, gate on
    `pmod(xxhash64(cols), 1000)` instead). Unlike `DataFrame.sampleBy`
    (seeded per-partition RNG → results change when partitioning
    changes), an identity gate yields the SAME sample on any cluster
    layout — reproducible training sets, exact-row oracle parity.
    """
    ev = load_table(spark, sf_dir, "events")
    fractions = {"error": 0.8}  # stratum → keep fraction; absent → drop
    frac = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(v))]
    )
    gate = F.pmod(F.col("event_id"), F.lit(10)) < F.coalesce(
        frac[F.col("event_type")] * 10, F.lit(0)
    )
    return ev.filter(gate).groupBy("event_type").agg(
        F.count("*").alias("n_sampled")
    )


PAGE_SIZE = 25


@register(
    "o03_keyset_pagination",
    # page 3 fetched keyset-style: the page-2 boundary key is derived by
    # the same query shape a paginating client would hold from page 2
    oracle=f"""
    WITH boundary AS (
      SELECT o_orderkey AS last_key FROM orders
      ORDER BY o_orderkey LIMIT 1 OFFSET {2 * PAGE_SIZE - 1}
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o, boundary b
    WHERE o.o_orderkey > b.last_key
    ORDER BY o.o_orderkey
    LIMIT {PAGE_SIZE}
    """,
    doc="O3 (ext.): keyset pagination — WHERE key > last_seen ORDER BY key "
    "LIMIT n instead of OFFSET. The predicate pushes into the parquet "
    "scan (min/max row-group skipping), so page N costs the same as page "
    "1; OFFSET pagination reads and discards N*page rows — O(n^2) to walk "
    "a 100 TB table. Plan-asserted: filter reaches the scan",
)
def o03_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # the boundary a client would carry from the previous page (bounded
    # driver scalar, same rule as SURVEY §4.4's small-aggregate collects)
    last_key = (
        orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(2 * PAGE_SIZE)
        .collect()[-1][0]
    )
    return (
        orders.filter(F.col("o_orderkey") > last_key)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(PAGE_SIZE)
    )


# --- U4 (ext.): multiset EXCEPT ALL / INTERSECT ALL --------------------------
# u02 covers SET semantics; bag semantics matter when duplicates carry
# meaning (per-occurrence reconciliation between two extracts: "how many
# copies remain after cancelling one-for-one"). Spark's exceptAll /
# intersectAll map to ANSI EXCEPT ALL / INTERSECT ALL — reduced here to
# per-key counts so the output is deterministic.
@register(
    "u03_multiset_ops",
    oracle="""
    SELECT 'except_all' AS which, user_id, COUNT(*) AS n FROM (
      SELECT user_id FROM events WHERE event_type IN ('click', 'view')
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase'
    ) GROUP BY user_id
    UNION ALL
    SELECT 'intersect_all', user_id, COUNT(*) FROM (
      SELECT user_id FROM events WHERE event_type IN ('click', 'view')
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase'
    ) GROUP BY user_id
    """,
    doc="U4 (ext.): multiset EXCEPT ALL / INTERSECT ALL (bag semantics — "
    "per-occurrence one-for-one cancellation, what extract reconciliation "
    "needs when duplicates carry meaning), reduced to per-key occurrence "
    "counts; Spark plans both as hash aggregates on the key, no sort",
)
def u03_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    engaged = ev.filter(F.col("event_type").isin("click", "view")).select("user_id")
    bought = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exc = (
        engaged.exceptAll(bought)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("which"), "user_id", "n")
    )
    inter = (
        engaged.intersectAll(bought)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("which"), "user_id", "n")
    )
    return exc.unionByName(inter)


# --- O4 (ext.): explicit null-ordering ranks ---------------------------------
@register(
    "o04_null_ordering_topk",
    # Spark defaults to NULLS FIRST on ASC / NULLS LAST on DESC; DuckDB
    # (per SQL standard practice) to NULLS LAST on ASC / FIRST on DESC —
    # so any cross-engine ranking over nullable keys MUST pin the null
    # ordering explicitly. The rank positions are materialized as values
    # (row_number), making the ordering itself hash-checkable.
    oracle="""
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v7
      FROM events
    )
    SELECT event_id, v7,
           ROW_NUMBER() OVER (ORDER BY v7 DESC NULLS LAST, event_id) AS rk_desc,
           ROW_NUMBER() OVER (ORDER BY v7 ASC NULLS FIRST, event_id) AS rk_asc
    FROM t
    ORDER BY rk_desc LIMIT 50
    """,
    doc="O4 (ext.): ranking over a nullable key with PINNED null ordering "
    "(desc_nulls_last / asc_nulls_first) — engines disagree on default "
    "null placement, so portable rankings must say it explicitly; the "
    "rank positions are emitted as values so the driver hash-checks the "
    "ordering semantics themselves, not just the row set. The global "
    "(unpartitioned) windows are the POINT of this demo — emitting "
    "global positions from both ends; the scale-shaped top-k variants "
    "are o01/o02 (TakeOrderedAndProject, per-partition heaps)",
)
def o04_null_ordering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    v7 = F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    t = ev.select("event_id", v7.alias("v7"))
    rk_desc = F.row_number().over(
        W.orderBy(F.col("v7").desc_nulls_last(), F.asc("event_id"))
    )
    rk_asc = F.row_number().over(
        W.orderBy(F.col("v7").asc_nulls_first(), F.asc("event_id"))
    )
    return (
        t.select("event_id", "v7", rk_desc.alias("rk_desc"), rk_asc.alias("rk_asc"))
        .orderBy("rk_desc")
        .limit(50)
    )


# --- p06-p08 (ext.): subquery shapes and their decorrelated Spark plans.
# The reference's SQL surface (and any PostgreSQL-backed dashboard) leans
# on correlated subqueries; Catalyst executes them as decorrelated
# joins. These three register the classic TPC-H shapes with the ORACLE
# written in genuine subquery form and the Spark side written as the
# decorrelated plan — the hash match IS the decorrelation-equivalence
# proof.
@register(
    "p06_correlated_scalar_subquery",
    # TPC-H Q17 shape: rows below half their group's mean. The correlated
    # scalar subquery recomputes the per-part mean for every outer row;
    # the decorrelated plan computes it once per key. Decimal moments
    # keep the threshold double bit-identical across engines.
    oracle="""
    SELECT l.l_partkey AS partkey,
           COUNT(*) AS n_small_lots,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
             AS small_lot_revenue
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                / COUNT(l2.l_quantity)) * 0.5
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY 1
    """,
    doc="p06 (ext.): correlated scalar subquery (TPC-H Q17 shape) — "
    "Spark side is the decorrelated per-key pre-aggregation + join; at "
    "scale that is one co-partitioned shuffle on l_partkey instead of a "
    "per-row recomputation, and AQE picks broadcast when the agg side "
    "is small",
)
def p06_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import davg, dsum

    li = load_table(spark, sf_dir, "lineitem")
    thr = li.groupBy("l_partkey").agg((davg("l_quantity") * 0.5).alias("half_avg_qty"))
    return (
        li.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count("*").alias("n_small_lots"),
            dsum("l_extendedprice").alias("small_lot_revenue"),
        )
    )


@register(
    "p07_in_subquery_having",
    # TPC-H Q18 shape: IN over a grouped+HAVING subquery. Catalyst plans
    # the IN as a left-semi join against the aggregated subquery.
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice
    FROM orders
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 100
    )
    """,
    doc="p07 (ext.): IN + GROUP BY/HAVING subquery (TPC-H Q18 shape) — "
    "decorrelated to pre-agg + left-semi join; the semi join ships only "
    "the key column and stops at first match, so the big fact side is "
    "never widened",
)
def p07_in_subquery_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_orderkey")
    )
    return (
        od.join(big, od.o_orderkey == big.l_orderkey, "left_semi")
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
    )


@register(
    "p08_not_exists_scalar",
    # TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join.
    # "Rich" customers (balance above the positive-balance mean) who have
    # never placed a 300k+ order, rolled up by market segment.
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_rich_inactive,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(c_acctbal)
      FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    GROUP BY 1
    """,
    doc="p08 (ext.): scalar-subquery threshold + NOT EXISTS (TPC-H Q22 "
    "shape) — the scalar agg is a 1-row broadcast crossJoin, the NOT "
    "EXISTS a left-anti join against the pre-filtered order keys "
    "(filter pushed below the join, so the anti side is tiny and "
    "broadcastable)",
)
def p08_not_exists_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import davg, dsum

    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    thr = cu.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal").alias("thr"))
    big_orders = od.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    return (
        cu.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(
            F.broadcast(big_orders),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_rich_inactive"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# --- p09 (ext.): TPC-H Q21 shape — chained semi + anti join ------------------

P09_LATE_DAYS = 60
P09_TOP = 20


@register(
    "p09_q21_shape",
    oracle=f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL {P09_LATE_DAYS} DAY
    ),
    waiting AS (
      SELECT w.l_orderkey, w.l_suppkey
      FROM late w
      WHERE EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = w.l_orderkey
                AND l2.l_suppkey <> w.l_suppkey)
        AND NOT EXISTS (
              SELECT 1 FROM late l3
              WHERE l3.l_orderkey = w.l_orderkey
                AND l3.l_suppkey <> w.l_suppkey)
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, s.s_name)
                AS BIGINT) AS rank
    FROM waiting w JOIN supplier s ON s.s_suppkey = w.l_suppkey
    GROUP BY s.s_name
    QUALIFY rank <= {P09_TOP}
    """,
    doc="p09 (ext.): the TPC-H Q21 'suppliers who kept orders waiting' "
    "shape — a chained EXISTS (some OTHER supplier on the order) + NOT "
    "EXISTS (no OTHER supplier was late) over the same fact table, "
    "decorrelated into one semi-join and one anti-join with a "
    "non-equi (suppkey <>) residual on the orderkey equi-key, then a "
    "supplier rollup and top-k. Completes the decorrelation kit begun "
    "by p06 (correlated scalar), p07 (IN + HAVING), p08 (NOT EXISTS): "
    f"'late' = shipped > {P09_LATE_DAYS} days after order date on "
    "status-F orders. Exactness: counts and ranks only. Scale shape: "
    "every join is equi-keyed on l_orderkey (the suppkey inequality "
    "rides as a residual), so the self-probes co-partition on one key "
    "and at sf0.01 Catalyst broadcasts the orders dim and the semi "
    "probe outright (plan-asserted: no cartesian, residual-bearing "
    "semi/anti joins); the supplier dim broadcasts into the final "
    "rollup. Reference analog: multi-condition exception reports in "
    "src/app.py dashboard SQL",
)
def p09_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    late = li.join(od, li["l_orderkey"] == od["o_orderkey"]).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {P09_LATE_DAYS} DAYS")
    ).select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    counted = (
        waiting.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )
    return (
        counted.withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.desc("numwait"), F.asc("s_name")))
            .cast("bigint"),
        )
        .filter(F.col("rank") <= P09_TOP)
    )


# --- p10 (ext.): TPC-H Q15 shape — argmax over an aggregated view ------------

P10_FROM = "1996-01-01"
P10_TO = "1996-04-01"


@register(
    "p10_q15_shape",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                      AS DECIMAL(27,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{P10_FROM}'
        AND l_shipdate < TIMESTAMP '{P10_TO}'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(total_revenue) AS max_revenue FROM revenue)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    CROSS JOIN mx
    WHERE r.total_revenue = mx.max_revenue
    """,
    doc="p10 (ext.): the TPC-H Q15 'top supplier' shape — an aggregated "
    "revenue view, a scalar MAX over it, and an equality join back "
    "(returns ALL tied argmax rows, which a naive ORDER BY ... LIMIT 1 "
    "silently drops). The scalar-subquery-over-view decorrelation "
    "pattern, completing p06–p09. Exactness: revenue totals are exact "
    "decimal sums, so the MAX equality is decimal-exact (an equality "
    "on floats here would be a correctness bug — the reason the "
    "decimal device matters beyond hashing). Scale shape: one "
    "map-combined agg of the filtered fact scan (predicate pushed to "
    "parquet), the 1-row MAX broadcast back over the agg output, and "
    "the supplier dim broadcast into the final join. Reference "
    "analog: 'top supplier' dashboard cards in src/app.py",
)
def p10_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(P10_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(P10_TO).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
                ).cast("decimal(27,6)")
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# --- p11 (ext.): Q20-shape correlated-agg-threshold IN, decorrelated ---------


@register(
    "p11_q20_shape",
    # TPC-H Q20's plan shape (IN subquery whose inner side carries a
    # correlated aggregate threshold — reference analog: the dashboard's
    # "suppliers with concentrated shipments" drill-down) adapted to this
    # schema: a supplier x part x year ships "concentrated" when one
    # quarter carries more than half the year's quantity. Decorrelation:
    # the correlated inner aggregate becomes ONE quarter-grain pre-agg,
    # the per-year threshold becomes a window sum over the SAME rows (no
    # second scan, no re-shuffle — the window reuses the agg's hash
    # partitioning on a prefix of its keys), and the IN becomes a plain
    # aggregate + broadcast dim join. Exactness: quantities are exact
    # DECIMAL sums and the threshold compares 2*q > y in decimal — no
    # float halving.
    oracle="""
    WITH lf AS (
      SELECT l.l_suppkey AS sk, l.l_partkey AS pk,
             CAST(year(l_shipdate) AS INT) AS yr,
             CAST(quarter(l_shipdate) AS INT) AS qtr,
             CAST(l_quantity AS DECIMAL(27,6)) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size < 15
    ),
    qq AS (
      SELECT sk, pk, yr, qtr, SUM(qty) AS q_qty
      FROM lf GROUP BY 1, 2, 3, 4
    ),
    yy AS (
      SELECT sk, pk, yr, q_qty,
             SUM(q_qty) OVER (PARTITION BY sk, pk, yr) AS y_qty
      FROM qq
    ),
    ex AS (
      SELECT DISTINCT sk, pk, yr FROM yy
      WHERE 2 * q_qty > y_qty AND y_qty >= 50
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_concentrated
    FROM ex JOIN supplier s ON s.s_suppkey = ex.sk
    GROUP BY 1, 2
    """,
    doc="p11 (ext.): TPC-H Q20-shape correlated-agg-threshold IN, "
    "decorrelated Spark-first — quarter-grain pre-agg once, the "
    "correlated per-year threshold as a window sum over the same "
    "shuffle (partition keys are a prefix of the agg keys), 2*q > y "
    "compared in exact DECIMAL, then distinct + broadcast supplier "
    "join. The filter on part pushes into the scan and the part join "
    "broadcasts; nothing rescans lineitem",
)
def p11_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    lf = li.join(
        F.broadcast(pt.select("p_partkey")),
        li["l_partkey"] == pt["p_partkey"],
    ).select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").cast("int").alias("yr"),
        F.quarter("l_shipdate").cast("int").alias("qtr"),
        F.col("l_quantity").cast("decimal(27,6)").alias("qty"),
    )
    qq = lf.groupBy("sk", "pk", "yr", "qtr").agg(F.sum("qty").alias("q_qty"))
    yy = qq.withColumn(
        "y_qty", F.sum("q_qty").over(W.partitionBy("sk", "pk", "yr"))
    )
    ex = (
        yy.filter((F.col("q_qty") * 2 > F.col("y_qty")) & (F.col("y_qty") >= 50))
        .select("sk", "pk", "yr")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        ex.join(F.broadcast(sup), ex["sk"] == sup["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("bigint").alias("n_concentrated"))
    )


# --- o05 (ext.): Pareto-frontier (skyline) per group ---------------------------


@register(
    "o05_pareto_skyline",
    # Skyline = the orders no other same-priority order strictly
    # dominates on (totalprice higher, orderdate later). Two-phase:
    # collapse to distinct price LEVELS carrying their max date (only
    # that date can survive per level), then one partitioned window —
    # a level is on the frontier iff its max date strictly exceeds the
    # running max over all strictly-higher price levels; ties at the
    # frontier (same price, same date) all survive, none strictly
    # dominates the other. All comparisons on exact doubles/timestamps;
    # no arithmetic at all.
    oracle="""
    WITH lvl AS (
      SELECT o_orderpriority AS pri, o_totalprice AS price,
             MAX(o_orderdate) AS dmax
      FROM orders GROUP BY 1, 2
    ),
    scan AS (
      SELECT pri, price, dmax,
             MAX(dmax) OVER (PARTITION BY pri ORDER BY price DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_dmax
      FROM lvl
    ),
    frontier AS (
      SELECT pri, price, dmax FROM scan
      WHERE prev_dmax IS NULL OR dmax > prev_dmax
    )
    SELECT o.o_orderpriority AS priority,
           CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           o.o_totalprice AS totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders o JOIN frontier f
      ON f.pri = o.o_orderpriority AND f.price = o.o_totalprice
     AND f.dmax = o.o_orderdate
    """,
    doc="o05 (ext.): Pareto-frontier (skyline) query — per priority "
    "class, the orders not strictly dominated on (totalprice, "
    "orderdate): the 'best tradeoffs' operator relational engines ship "
    "as SKYLINE OF. Spark-first two-phase: a map-combined price-level "
    "pre-agg (only a level's max date can survive) then ONE "
    "partitioned running-max window and a semi-join back — never an "
    "all-pairs dominance test, never a global sort; at 100 TB the "
    "pre-agg bounds the window input to distinct price levels per "
    "group",
)
def o05_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    lvl = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("price"),
    ).agg(F.max("o_orderdate").alias("dmax"))
    w = (
        W.partitionBy("pri")
        .orderBy(F.desc("price"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    scan = lvl.withColumn("prev_dmax", F.max("dmax").over(w))
    frontier = scan.filter(
        F.col("prev_dmax").isNull() | (F.col("dmax") > F.col("prev_dmax"))
    ).select("pri", "price", "dmax")
    return orders.join(
        F.broadcast(frontier),
        (orders["o_orderpriority"] == frontier["pri"])
        & (orders["o_totalprice"] == frontier["price"])
        & (orders["o_orderdate"] == frontier["dmax"]),
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


# --- p12 (ext.): Q11-shape HAVING vs global scalar, decorrelated ---------------

_P12_FRACTION = 0.002


@register(
    "p12_q11_shape",
    # TPC-H Q11's plan shape: a grouped aggregate kept only where its
    # value exceeds a FRACTION OF THE GLOBAL TOTAL (scalar subquery in
    # HAVING). Decorrelated Spark-first: the global total is the SAME
    # aggregate re-reduced (re-aggregable decimal partials — no second
    # scan of the fact) and broadcast as a 1-row literal join; the
    # HAVING compares exact decimal revenue against fraction * total on
    # identical doubles.
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(27,6))) AS r
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(CAST(ROUND(r, 6) AS DECIMAL(27,6))) AS DOUBLE) AS t
      FROM rev
    )
    SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
           CAST(r AS DOUBLE) AS revenue,
           CAST(r AS DOUBLE) / t AS share
    FROM rev CROSS JOIN tot
    WHERE CAST(r AS DOUBLE) > {_P12_FRACTION} * t
    """,
    doc="p12 (ext.): TPC-H Q11-shape 'HAVING > fraction of global "
    "total', decorrelated — the per-supplier revenue aggregate's own "
    "decimal partials re-reduce to the global scalar (one fact scan "
    "total), which broadcasts back for the threshold filter. Exact "
    "decimal sums; the share and threshold are single IEEE expressions "
    "on identical doubles (no rounding anywhere, so no midpoint can "
    "flip a row's membership differently per engine)",
)
def p12_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(27,6)"
            )
        ).alias("r")
    )
    tot = rev.agg(
        F.sum(F.round("r", 6).cast("decimal(27,6)"))
        .cast("double")
        .alias("t")
    )
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("r").cast("double") > _P12_FRACTION * F.col("t"))
        .select(
            F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
            F.col("r").cast("double").alias("revenue"),
            (F.col("r").cast("double") / F.col("t")).alias("share"),
        )
    )


# --- p13 (ext.): TPC-H Q2 shape — correlated MIN subquery, decorrelated --------


@register(
    "p13_q02_shape",
    # TPC-H Q2's signature shape: for each part, the supplier(s) offering
    # the MINIMUM unit cost, where the minimum comes from a correlated
    # scalar subquery over the same link table. The oracle keeps the
    # genuine correlated form; the Spark side is the decorrelated
    # per-part MIN pre-aggregation joined back — the equality on the
    # exact IEEE quotient keeps ties (Q2 returns all tied suppliers).
    # The testdata has no partsupp table, so lineitem plays the
    # part-supplier link with extendedprice/quantity as the unit cost
    # (reference analog: the reference's dashboards never decorrelate —
    # PostgreSQL does it for them; here the decorrelated plan IS the
    # implementation and the hash match proves equivalence).
    oracle="""
    WITH link AS (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_cost
      FROM lineitem
    )
    SELECT p.p_partkey AS p_partkey,
           p.p_brand AS p_brand,
           s.s_suppkey AS s_suppkey,
           n.n_name AS nation,
           l.unit_cost AS unit_cost
    FROM link l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l.unit_cost = (
      SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    """,
    doc="p13 (ext.): TPC-H Q2 shape — min-cost supplier per part via a "
    "correlated MIN scalar subquery, decorrelated into a per-part MIN "
    "pre-aggregation + equi-join back (ties kept, as Q2 requires). At "
    "scale: ONE shuffle on l_partkey shared by the pre-agg and the "
    "join (vs the correlated form's per-row rescan); supplier/nation/"
    "part dims broadcast. MIN over doubles is order-independent, so "
    "the quotient needs no rounding device",
)
def p13_q02_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    link = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    min_cost = link.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("min_cost")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        link.join(min_cost, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_brand",
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "nation",
            "unit_cost",
        )
    )


# --- p14 (ext.): TPC-H Q13 shape — left-join count distribution -----------------


@register(
    "p14_q13_shape",
    # Q13's customer-order distribution: LEFT join so zero-order
    # customers survive with c_count = 0, then the distribution of the
    # per-customer counts. Two stacked aggregations over one join — the
    # "histogram of group sizes" shape every engagement dashboard runs.
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="p14 (ext.): TPC-H Q13 shape — the distribution of orders per "
    "customer including zero-order customers (LEFT join + COUNT(col) "
    "null semantics + a second aggregate over the first's output). "
    "Scale: the join and the per-customer count share one "
    "hash-partitioning on the customer key (Catalyst reuses the "
    "exchange); the distribution aggregate runs on the already-"
    "reduced per-customer table, map-combined on the tiny c_count "
    "domain. Exactness: pure integer counts",
)
def p14_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


# --- p15 (ext.): TPC-H Q16 shape — NOT IN + grouped count-distinct ---------------


@register(
    "p15_q16_shape",
    # Q16's signature: suppliers per part class, EXCLUDING a
    # subquery-defined supplier blocklist (NOT IN -> null-safe anti
    # join) and counting DISTINCT suppliers after a many-to-many link.
    # Blocklist: suppliers with below-median account balance whose name
    # ends in an odd digit — subquery-shaped, deterministic.
    oracle="""
    WITH block AS (
      SELECT s_suppkey FROM supplier
      WHERE s_acctbal < 0 OR s_suppkey % 7 = 0
    )
    SELECT p.p_brand AS brand, p.p_size AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM block)
    GROUP BY p.p_brand, p.p_size
    """,
    doc="p15 (ext.): TPC-H Q16 shape — distinct-supplier counts per "
    "(brand, size) with a NOT IN supplier blocklist. The NOT IN is "
    "hand-decorrelated into a plain broadcast LEFT ANTI join (valid "
    "because s_suppkey is a non-nullable key column, so the NOT IN "
    "null semantics cannot diverge; the LeftAnti plan shape is "
    "asserted in test_q16_shape_null_aware_anti_broadcast) and the "
    "count-distinct is a two-phase aggregate. Completes the TPC-H subquery-shape set (Q2/Q11/Q13/"
    "Q15/Q17/Q20/Q21/Q22 already covered). Scale: one fact scan, "
    "blocklist broadcast anti join, part dim broadcast, partial "
    "distinct aggregation before the (brand,size) shuffle",
)
def p15_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    supp = load_table(spark, sf_dir, "supplier")
    block = supp.filter(
        (F.col("s_acctbal") < 0) | (F.col("s_suppkey") % 7 == 0)
    ).select("s_suppkey")
    kept = li.join(
        F.broadcast(block),
        li["l_suppkey"] == block["s_suppkey"],
        "left_anti",
    )
    return (
        kept.join(F.broadcast(part), kept["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"), F.col("p_size").alias("p_size")
        )
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


# --- o06 (ext.): nucleus cover (min top-k reaching a share target) ---------------


@register(
    "o06_nucleus_cover",
    # Per event type: the smallest number of top users whose combined
    # value reaches 90% of the type's total (the inverse of a30's
    # "share held by top X%"). The >= 90% test is done IN DECIMAL
    # (cum*10 >= total*9) so no float quotient can flip the boundary
    # row differently per engine.
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             SUM(CAST(value AS DECIMAL(27,6))) AS tot
      FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, tot,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY tot DESC, user_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n_users,
             SUM(tot) OVER (PARTITION BY event_type
                            ORDER BY tot DESC, user_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
             SUM(tot) OVER (PARTITION BY event_type) AS grand
      FROM per_user
    )
    SELECT event_type,
           CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(MIN(CASE WHEN cum * 10 >= grand * 9 THEN rk END)
                AS BIGINT) AS nucleus_users,
           CAST(MIN(CASE WHEN cum * 10 >= grand * 9 THEN rk END)
                AS DOUBLE) / MAX(n_users) AS nucleus_user_frac
    FROM ranked GROUP BY event_type
    """,
    doc="o06 (ext.): nucleus cover — per event type, the minimum number "
    "of top users whose combined value reaches 90% of the total, and "
    "the fraction of the user base that is (top-p/nucleus selection "
    "applied to contribution analysis; a30 answers 'how much do the "
    "top X% hold', o06 answers 'how few cover 90%'). Scale: windows "
    "run over the per-(type, user) pre-aggregate, partitioned by "
    "type; the share test is exact decimal arithmetic (cum*10 >= "
    "total*9), so the boundary user never flips between engines",
)
def o06_nucleus_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(27,6)")).alias("tot")
    )
    wo = W.partitionBy("event_type").orderBy(
        F.desc("tot"), F.asc("user_id")
    )
    wa = W.partitionBy("event_type")
    ranked = per_user.select(
        "event_type",
        F.row_number().over(wo).alias("rk"),
        F.count("*").over(wa).alias("n_users"),
        F.sum("tot")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("tot").over(wa).alias("grand"),
    )
    hit = F.when(
        F.col("cum") * 10 >= F.col("grand") * 9, F.col("rk")
    )
    return ranked.groupBy("event_type").agg(
        F.max("n_users").cast("bigint").alias("n_users"),
        F.min(hit).cast("bigint").alias("nucleus_users"),
        (F.min(hit).cast("double") / F.max("n_users")).alias(
            "nucleus_user_frac"
        ),
    )


# --- d02 (ext.): normalize-then-dedup (entity resolution lite) ------------------


@register(
    "d02_normalized_dedup",
    # Two deterministically DIRTY variants of every customer name
    # (case flips, padding whitespace, spaced-out '#') are normalized
    # (lower + trim + collapse around '#') and deduped on the
    # normalized key — the canonical entity-resolution-lite stage that
    # runs before any exact-key dedup (d01) can work. Every group must
    # come out with exactly the two variants merged.
    oracle="""
    WITH dirty AS (
      SELECT c_custkey * 2 AS row_id,
             upper(c_name) || '  ' AS raw
      FROM customer
      UNION ALL
      SELECT c_custkey * 2 + 1,
             '  ' || replace(c_name, '#', ' # ')
      FROM customer
    ),
    norm AS (
      SELECT row_id,
             regexp_replace(trim(lower(raw)), ' *# *', '#', 'g') AS k
      FROM dirty
    )
    SELECT k AS normalized_name,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(row_id) AS BIGINT) AS survivor_row,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_removed
    FROM norm GROUP BY k
    """,
    doc="d02 (ext.): normalize-then-dedup — deterministic dirty name "
    "variants (case, padding, spaced punctuation) collapse onto one "
    "normalized key (lower + trim + collapse-around-#), keeping the "
    "min-id survivor. The entity-resolution-lite stage upstream of "
    "d01's exact keyed dedup: raw operational keys rarely match "
    "byte-for-byte. Scale: pure JVM string expressions fused into the "
    "scan + ONE hash aggregate on the normalized key — the word-count "
    "shuffle shape. Exactness: identical normalization in both "
    "engines, integer counts",
)
def d02_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select(
        (F.col("c_custkey") * 2).alias("row_id"),
        F.concat(F.upper("c_name"), F.lit("  ")).alias("raw"),
    )
    v2 = c.select(
        (F.col("c_custkey") * 2 + 1).alias("row_id"),
        F.concat(
            F.lit("  "), F.regexp_replace("c_name", "#", " # ")
        ).alias("raw"),
    )
    norm = v1.unionByName(v2).select(
        "row_id",
        F.regexp_replace(
            F.trim(F.lower("raw")), " *# *", "#"
        ).alias("k"),
    )
    return norm.groupBy(F.col("k").alias("normalized_name")).agg(
        F.count("*").cast("bigint").alias("n_variants"),
        F.min("row_id").cast("bigint").alias("survivor_row"),
        (F.count("*") - 1).cast("bigint").alias("n_removed"),
    )


# --- p16 (ext.): TPC-H Q4 shape — EXISTS semi-join priority count -------------------


@register(
    "p16_q04_shape",
    # Q4's signature: orders in a date window having AT LEAST ONE
    # late line item (EXISTS with a correlated date comparison across
    # tables), counted by priority. The EXISTS decorrelates to a LEFT
    # SEMI join on the order key with the date predicate as the join
    # filter — one pass over each table, no per-order rescans, and
    # duplicate late lines cannot double-count (semi-join semantics).
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="p16 (ext.): TPC-H Q4 shape — count orders per priority that "
    "have at least one late line item (ship date beyond 80 days "
    "after the order date) within a one-year window. The correlated "
    "EXISTS decorrelates to a LEFT SEMI hash join on o_orderkey with "
    "the cross-table date comparison as a join-side filter; the date "
    "window prunes the orders scan first. Completes the TPC-H "
    "subquery-shape set alongside p08's Q22 NOT EXISTS and p09's "
    "Q21 chained EXISTS/NOT EXISTS. Scale: both scans filter before "
    "the key-partitioned semi join; the 5-row priority aggregate is "
    "map-side combined. Exactness: pure integer counts. "
    "Ref parity: the reference dashboard's HAVING/derived-table "
    "shapes (src/app.py:48-57) never need EXISTS because SQLite "
    "inlines it; Spark plans it as LeftSemi explicitly",
)
def p16_q04_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


# --- p17 (ext.): TPC-H Q18 shape — large-volume-order semi join ---------------------


@register(
    "p17_q18_shape",
    # Q18's signature: a HAVING SUM(...) > T aggregate over the fact
    # table DEFINES the key set, which then semi-joins back into the
    # order/customer detail — the aggregate-as-filter shape. The
    # quantity threshold keeps the key set tiny, so the back-join
    # broadcasts; top-k rides TakeOrderedAndProject.
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 180
    )
    SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice,
           CAST(s.sum_qty AS BIGINT) AS sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey) s
      ON s.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="p17 (ext.): TPC-H Q18 shape — large-volume orders: the "
    "HAVING-aggregate over lineitem defines the qualifying key set "
    "(sum quantity > 180), which semi-joins back into order + "
    "customer detail, top-20 by total price. The aggregate-as-filter "
    "pattern behind every 'whales report'. Scale: ONE map-combined "
    "per-order aggregate serves both the filter and the reported "
    "sum; the filtered key set is threshold-small and broadcasts; "
    "the top-k is TakeOrderedAndProject, never a global sort. "
    "Exactness: integer quantities and keys",
)
def p17_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    qty = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty")
    )
    big = qty.filter(F.col("sum_qty") > 180).select("l_orderkey")
    return (
        orders.join(
            F.broadcast(big),
            orders["o_orderkey"] == big["l_orderkey"],
            "left_semi",
        )
        .join(qty, qty["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            "o_orderkey", "o_custkey", "c_name", "o_totalprice", "sum_qty"
        )
        .limit(20)
    )


# --- p18 (ext.): TPC-H Q19 shape — disjunctive predicate pushdown -------------------


@register(
    "p18_q19_shape",
    # Q19's signature: an OR of three AND-groups spanning two tables.
    # The per-table conjuncts common to every branch (quantity and
    # size windows wide enough to cover all three) push into the
    # scans; the residual disjunction rides the hash join. Revenue
    # stays exact through the decimal-sum device.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 6)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_brand = 'Brand#12')
       OR (p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_brand = 'Brand#23')
       OR (p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_brand = 'Brand#34')
    """,
    doc="p18 (ext.): TPC-H Q19 shape — revenue under an OR of three "
    "AND-groups spanning lineitem and part. The optimizer derives "
    "the branch-union bounds (quantity 1-30, size 1-15) as pushable "
    "per-table conjuncts while the residual disjunction evaluates on "
    "the joined row — the disjunctive-pushdown pattern OR-heavy "
    "pricing rules hit constantly. Scale: both scans pre-filter "
    "before the key-partitioned join (part side broadcast-eligible); "
    "one 2-column aggregate. Exactness: per-line revenue rounded "
    "once to 6dp and summed as DECIMAL (order-independent)",
)
def p18_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    branch = (
        (
            F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
            & (F.col("p_brand") == "Brand#12")
        )
        | (
            F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
            & (F.col("p_brand") == "Brand#23")
        )
        | (
            F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
            & (F.col("p_brand") == "Brand#34")
        )
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(27,6)")
    return j.filter(branch).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# --- p19-p27 (ext.): the remaining canonical TPC-H join/group/order shapes ---
# VERDICT r8 directive #2: Q3/Q5/Q7/Q8/Q9/Q10/Q12/Q14/Q22 analogs. The
# testdata schema lacks partsupp, l_shipmode/commitdate/receiptdate,
# o_shippriority and c_phone, so each query keeps the canonical JOIN
# TOPOLOGY and aggregation shape while substituting documented analog
# columns (noted per query). All money sums ride the exact decimal-sum
# device (functions/numeric.dsum); ratio outputs use the ROUND(x, 9)
# both-sides device proven by a37.

from ..functions.numeric import davg as _davg  # noqa: E402
from ..functions.numeric import dsum as _dsum  # noqa: E402
from ..functions.numeric import sql_davg as _sql_davg  # noqa: E402
from ..functions.numeric import sql_dsum as _sql_dsum  # noqa: E402

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "p19_q03_shape",
    # Q3: shipping-priority candidate orders — segment-filtered customers,
    # orders placed before / lines shipped after a cut date, top-10 open
    # revenue. o_orderpriority stands in for the missing o_shippriority.
    oracle=f"""
    SELECT l.l_orderkey,
           {_sql_dsum(_REV)} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="p19 (ext.): TPC-H Q3 shape — top-10 highest-open-revenue orders "
    "for one market segment (orders placed before, lines shipped after "
    "a cut date). customer->orders->lineitem star joins with both date "
    "filters pushed to the scans; revenue is the exact decimal sum and "
    "the top-10 is a TakeOrderedAndProject with l_orderkey tiebreak "
    "(no full sort). o_orderpriority substitutes the absent "
    "o_shippriority. Ref parity: the reference dashboard's top-N "
    "revenue queries (src/app.py:80-101)",
)
def p19_q03_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        od.join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(_rev_col()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@register(
    "p20_q05_shape",
    # Q5: local-supplier revenue by nation within one region/year —
    # the canonical 6-table star with the c_nationkey = s_nationkey
    # "local supplier" equality rider on the lineitem-supplier join.
    oracle=f"""
    SELECT n.n_name, {_sql_dsum(_REV)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="p20 (ext.): TPC-H Q5 shape — revenue by nation where customer "
    "and supplier share a nation, one region, one order-year. The "
    "region->nation->supplier dimension chain broadcasts into the "
    "lineitem scan; the local-supplier constraint rides the supplier "
    "join as an extra equality; orders' date window prunes before the "
    "fact join. One shuffle per fact join key + a 5-row aggregate. "
    "Exactness: decimal-sum device. Ref parity: the reference's "
    "region-rollup dashboard join (src/app.py:131-150)",
)
def p20_q05_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = (
        na.join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(
            od.join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(su),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(_rev_col()).alias("revenue"))
    )


@register(
    "p21_q07_shape",
    # Q7: bilateral shipping volume between two nations by ship year —
    # the two-role nation join (n1 supplies, n2 buys) with the
    # direction disjunction.
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           {_sql_dsum(_REV)} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="p21 (ext.): TPC-H Q7 shape — revenue shipped between two "
    "specific nations, both directions, split by ship year. The nation "
    "dimension joins twice under different roles (supplier's vs "
    "customer's nation) and the direction pair is a disjunction "
    "evaluated after both broadcasts; the two-year ship window pushes "
    "into the lineitem scan. Exactness: decimal-sum device; year CAST "
    "BIGINT on both engines. Ref parity: the reference's district-"
    "pair comparison report (src/app.py:151-170)",
)
def p21_q07_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = na.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "n1_key"
    )
    n2 = na.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "n2_key"
    )
    pair = (F.col("supp_nation") == "NATION_3") & (
        F.col("cust_nation") == "NATION_7"
    ) | (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_dsum(_rev_col()).alias("revenue"))
    )


@register(
    "p22_q08_shape",
    # Q8: national market share — target nation's slice of regional
    # promo-part volume by order year. The share ratio uses the
    # ROUND(x, 9) both-sides device (a37); numerator and denominator
    # are also emitted as exact decimal sums so the raw quantities
    # stay hash-checked.
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {_sql_dsum("CASE WHEN n2.n_name = 'NATION_1' THEN " + _REV + " ELSE 0.0 END")} AS nation_volume,
           {_sql_dsum(_REV)} AS total_volume,
           ROUND({_sql_dsum("CASE WHEN n2.n_name = 'NATION_1' THEN " + _REV + " ELSE 0.0 END")}
                 / {_sql_dsum(_REV)}, 9) AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
    doc="p22 (ext.): TPC-H Q8 shape — a supplier nation's market share "
    "of PROMO-part volume sold into one region, by order year. Eight-"
    "table topology: part prunes the fact scan hardest so it leads; "
    "customer-side nation->region restricts the buyer, supplier-side "
    "nation labels the seller; the share is a conditional-sum / sum "
    "ratio. Scale: all dimensions broadcast; single fact shuffle on "
    "l_orderkey; 2-row result. Exactness: decimal sums; share "
    "ROUND(,9) on both engines. Ref parity: reference market-share "
    "report (src/app.py:171-196)",
)
def p22_q08_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    buyer_nations = na.join(
        F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("buyer_nkey"))
    seller = na.select(
        F.col("n_nationkey").alias("seller_nkey"), F.col("n_name").alias("seller_nation")
    )
    vol = _rev_col()
    nat_vol = F.when(F.col("seller_nation") == "NATION_1", vol).otherwise(F.lit(0.0))
    grouped = (
        li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(buyer_nations), F.col("c_nationkey") == F.col("buyer_nkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(seller), F.col("s_nationkey") == F.col("seller_nkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            _dsum(nat_vol).alias("nation_volume"),
            _dsum(vol).alias("total_volume"),
        )
    )
    return grouped.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 9).alias("mkt_share"),
    )


@register(
    "p23_q09_shape",
    # Q9: product-line profit by supplier nation and order year. The
    # testdata has no partsupp, so supply cost is the documented proxy
    # 0.6 * p_retailprice (injected as CAST('<repr>' AS DOUBLE) so
    # DuckDB's decimal literal parse cannot drift one ulp — the a43
    # lesson); the join topology (part+supplier+orders+nation around
    # lineitem) and the profit-expression shape are Q9's.
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {_sql_dsum("(l.l_extendedprice * (1 - l.l_discount))"
                      " - ((CAST('0.6' AS DOUBLE) * p.p_retailprice) * l.l_quantity)")}
             AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
    doc="p23 (ext.): TPC-H Q9 shape — profit on one product line by "
    "supplier nation and order year. partsupp is absent from the "
    "testdata, so unit cost is the documented 0.6*p_retailprice proxy "
    "(float literal injected as CAST('0.6' AS DOUBLE) both sides); "
    "everything else is Q9: LIKE-filtered part broadcast pruning the "
    "fact scan, supplier/nation labeling, per-(nation, year) profit "
    "sums. The profit expression is parenthesized identically in both "
    "engines (IEEE double ops are deterministic given identical "
    "association) and summed via the decimal device. Ref parity: "
    "reference profitability report (src/app.py:120-130)",
)
def p23_q09_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) - (
        (F.lit(0.6) * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
    )


@register(
    "p24_q10_shape",
    # Q10: returned-item revenue — top-20 customers by revenue lost to
    # returns in one quarter, with customer attributes and nation.
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_sql_dsum(_REV)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="p24 (ext.): TPC-H Q10 shape — top-20 customers by revenue on "
    "returned items in one quarter. The returnflag filter pushes into "
    "the lineitem scan and the quarter window into orders before the "
    "fact join; customer attributes ride the groupBy (functionally "
    "dependent on c_custkey, kept in the key per Q10); top-20 is "
    "TakeOrderedAndProject with the unique c_custkey tiebreak. "
    "Exactness: decimal-sum revenue; c_acctbal passes through as raw "
    "parquet doubles. Ref parity: reference top-customers report "
    "(src/app.py:102-119)",
)
def p24_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_rev_col()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "p25_q12_shape",
    # Q12: priority counts under a lateness predicate. The testdata
    # has no l_shipmode/commitdate/receiptdate, so the grouping
    # dimension is l_linestatus and "late" means shipped more than 45
    # days after the order date — the conditional-count shape
    # (CASE WHEN priority-in-set) and the cross-table date predicate
    # are Q12's.
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
    GROUP BY l.l_linestatus
    """,
    doc="p25 (ext.): TPC-H Q12 shape — high/low-priority line counts "
    "for late shipments in one year. l_linestatus stands in for the "
    "absent l_shipmode and ship-more-than-45-days-after-order for the "
    "receipt/commit lateness chain; the two conditional counts "
    "(priority in/out of the urgent set) and the cross-table date "
    "predicate riding the join are Q12's signature. Scale: the year "
    "window pushes into the lineitem scan; the lateness comparison "
    "evaluates on the joined row; 2-row result, map-side combined. "
    "Exactness: pure integer counts. Ref parity: reference priority "
    "split report (src/app.py:58-79)",
)
def p25_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        od.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "p26_q14_shape",
    # Q14: promo revenue share — per ship month of 1997 instead of the
    # single-month scalar, so the result exercises the ratio at 12
    # grouping keys. 100.0 is exactly representable, so the bare
    # literal is decimal-parse-safe in DuckDB.
    oracle=f"""
    SELECT CAST(EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS ship_month,
           {_sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN " + _REV + " ELSE 0.0 END")} AS promo_revenue,
           {_sql_dsum(_REV)} AS total_revenue,
           ROUND(100.0 * {_sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN " + _REV + " ELSE 0.0 END")}
                 / {_sql_dsum(_REV)}, 9) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ship_month
    """,
    doc="p26 (ext.): TPC-H Q14 shape — PROMO parts' percentage of "
    "revenue, by ship month across 1997 (12 groups instead of Q14's "
    "single scalar month). Conditional-sum over total-sum ratio with "
    "the part dimension broadcast into the fact scan and the year "
    "window pushed down. Exactness: both sums exact-decimal; the "
    "percentage is ROUND(100.0 * promo / total, 9) with identical "
    "association on both engines (100.0 converts exactly). Ref "
    "parity: reference promo-mix report (src/app.py:120-130)",
)
def p26_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    grouped = (
        li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.month("l_shipdate").cast("bigint").alias("ship_month"))
        .agg(
            _dsum(promo).alias("promo_revenue"),
            _dsum(rev).alias("total_revenue"),
        )
    )
    return grouped.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 9
        ).alias("promo_pct"),
    )


@register(
    "p27_q22_shape",
    # Q22 in full: positive-balance mean over a restricted code set as
    # the threshold (scalar subquery), rich customers with NO orders at
    # all (NOT EXISTS), rolled up by code. c_phone is absent, so the
    # country code is the documented analog c_nationkey % 7, restricted
    # to codes {1, 3, 5, 6}.
    oracle="""
    WITH coded AS (
      SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode,
             c_custkey, c_acctbal
      FROM customer
      WHERE CAST(c_nationkey % 7 AS BIGINT) IN (1, 3, 5, 6)
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
    FROM coded c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(c_acctbal)
        FROM coded WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntrycode
    """,
    doc="p27 (ext.): TPC-H Q22 in full — 'global sales opportunity': "
    "customers in a code band whose balance beats the positive-balance "
    "mean of that band-set and who have placed no order since "
    "2000-01-01 (every sf customer has SOME order, so the recency cut "
    "keeps the NOT EXISTS non-degenerate), counted and totalled per "
    "code. c_nationkey % 7 is the documented stand-in for "
    "the absent phone country code. The scalar mean is a 1-row exact "
    "decimal average broadcast-crossJoined onto the filtered scan "
    "(p08's device); NOT EXISTS is a left-anti against the distinct "
    "order custkeys (key-partitioned at scale, never collected). "
    "Exactness: decimal sum/avg; integer counts. Ref parity: the "
    "reference's inactive-account report (src/app.py:48-57)",
)
def p27_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") % 7).cast("bigint").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    ).filter(F.col("cntrycode").isin(1, 3, 5, 6))
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    thr = cu.filter(F.col("c_acctbal") > 0.0).agg(_davg("c_acctbal").alias("thr"))
    return (
        cu.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(od, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --- u04 (ext.): schema-evolution union (missing columns -> NULL) --------------------


@register(
    "u04_union_allow_missing",
    # Two extracts with drifted schemas (an old feed without the
    # discount column, a new feed without the tax column) unioned BY
    # NAME with absent columns null-filled — Spark's
    # unionByName(allowMissingColumns=True) == DuckDB's UNION ALL BY
    # NAME. The row-level companion to s16's read-side schema
    # evolution.
    oracle="""
    SELECT feed, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(l_discount) AS BIGINT) AS n_with_discount,
           CAST(COUNT(l_tax) AS BIGINT) AS n_with_tax
    FROM (
      SELECT 'old' AS feed, l_orderkey, l_returnflag, l_tax
      FROM lineitem WHERE l_linenumber = 1
      UNION ALL BY NAME
      SELECT 'new' AS feed, l_orderkey, l_returnflag, l_discount
      FROM lineitem WHERE l_linenumber = 2
    )
    GROUP BY feed, l_returnflag
    """,
    doc="u04 (ext.): schema-evolution union — two feeds whose column "
    "sets drifted (one lacks l_discount, the other lacks l_tax) "
    "combined by COLUMN NAME with missing fields null-filled, then "
    "profiled per feed (row counts and per-column presence counts). "
    "unionByName(allowMissingColumns=True) is the Spark idiom; "
    "positional UNION would silently misalign the columns — the "
    "failure mode this operator exists to prevent. Scale: pure "
    "narrow union + one map-combined aggregate. Exactness: integer "
    "counts. Ref parity: the reference's multi-vintage feed merge "
    "(src/enhanced_ingestion.py:420-440)",
)
def u04_union_allow_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    old = li.filter(F.col("l_linenumber") == 1).select(
        F.lit("old").alias("feed"), "l_orderkey", "l_returnflag", "l_tax"
    )
    new = li.filter(F.col("l_linenumber") == 2).select(
        F.lit("new").alias("feed"), "l_orderkey", "l_returnflag", "l_discount"
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy("feed", "l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count("l_discount").cast("bigint").alias("n_with_discount"),
        F.count("l_tax").cast("bigint").alias("n_with_tax"),
    )


# --- o07 (ext.): top-k WITH TIES (rank semantics) ------------------------------------


@register(
    "o07_topk_with_ties",
    # FETCH FIRST k ROWS WITH TIES: every row tying the k-th value
    # comes along, so the result is value-deterministic with NO
    # tiebreaker column — the semantics ORDER BY + LIMIT silently gets
    # wrong when the sort key has duplicates (o01 solves it with a
    # unique tiebreak; this keeps the ties instead). rank() <= k is
    # the portable formulation both engines agree on.
    oracle="""
    SELECT l_quantity, l_orderkey, l_linenumber
    FROM (
      SELECT l_quantity, l_orderkey, l_linenumber,
             RANK() OVER (ORDER BY l_quantity DESC) AS rk
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    ) WHERE rk <= 10
    """,
    doc="o07 (ext.): top-k WITH TIES — the FETCH FIRST ... WITH TIES "
    "semantics via rank() <= k: all rows tying the k-th sort value "
    "are kept, so the answer is a deterministic SET without a "
    "tiebreaker (plain LIMIT k would return an engine-dependent "
    "subset of the tied rows — the silent-nondeterminism bug o01 "
    "avoids with a unique key and this operator avoids by keeping "
    "ties). Scale: Spark plans the rank filter as WindowGroupLimit — "
    "each partition keeps only its local top-k before the single-key "
    "shuffle, the same property TakeOrderedAndProject gives LIMIT. "
    "Exactness: integer/double comparisons only, no arithmetic. "
    "Ref parity: the reference top-N views (src/app.py:80-101) "
    "which break ties arbitrarily",
)
def o07_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.select("l_quantity", "l_orderkey", "l_linenumber")
        .withColumn(
            "rk", F.rank().over(W.orderBy(F.desc("l_quantity")))
        )
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )


# --- p28 (ext.): TPC-H Q6 shape — predicate-only revenue delta ------------------------


@register(
    "p28_q06_shape",
    # Q6: the simplest TPC-H query and the purest pushdown test — a
    # global revenue sum under three range predicates, no joins, no
    # groups. With p28 every one of the 22 canonical TPC-H query
    # shapes has an analog in the registry (Q1=a01, Q2=p13, Q3=p19,
    # Q4=p16, Q5=p20, Q6=p28, Q7=p21, Q8=p22, Q9=p23, Q10=p24,
    # Q11=p12, Q12=p25, Q13=p14, Q14=p26, Q15=p10, Q16=p15, Q17=p06,
    # Q18=p17, Q19=p18, Q20=p11, Q21=p09, Q22=p27).
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * l_discount, 6)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    doc="p28 (ext.): TPC-H Q6 shape — 'forecasting revenue change': "
    "the discount-band revenue that would vanish if the discounts "
    "were cancelled, one scan, zero joins. All three predicates push "
    "into the parquet scan (PushedFilters shows the shipdate range, "
    "the discount band and the quantity cap); the sum is one "
    "map-side-combined aggregate — the minimal pushdown+combine "
    "benchmark every engine review starts with, completing the "
    "22-shape TPC-H set. Exactness: per-line round-to-6dp decimal "
    "sum (p18's device). Ref parity: the reference's single-filter "
    "revenue tile (src/app.py:48-57)",
)
def p28_q06_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.round(
        F.col("l_extendedprice") * F.col("l_discount"), 6
    ).cast("decimal(27,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue_delta"),
        )
    )
