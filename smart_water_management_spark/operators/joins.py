"""Join operators (SURVEY.md §2.3 J1-J8) plus the as-of/range join
extensions, Spark-first.

Reference sites: stats broadcast join src/spark_etl.py:87-96; multi-key
left join src/enhanced_spark_etl.py:433-437; star joins src/app.py:90-93
et al.; row-wise FK lookup src/warehouse_loader_real_data.py:209-237
(re-expressed here as set-based equi-joins — the reference's O(n·m)
iterrows loop is the one pattern we deliberately do NOT reproduce);
LATERAL rewrite sql/enhanced_data_schema.sql:421-433.

Scale posture: dimension sides are broadcast (`F.broadcast`) so the fact
table never shuffles for star joins; large-large joins fall to sort-merge
with AQE skew splitting. The as-of join avoids a naive non-equi
nested-loop by the union + last-value-carry-forward pattern (one shuffle,
one sort — same asymptotics as a sort-merge join). The range join avoids
BroadcastNestedLoop by bucketizing the time axis and equi-joining on
(key, bucket) before the residual range filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from ..registry import register
from ..sources.catalog import load_table


# --- J1: small-dim broadcast join (reference src/spark_etl.py:87-96 joins
# per-type stats back to readings; here: region/nation dims onto customer).
@register(
    "j01_broadcast_dims",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal')} AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="J1: broadcast-hash star join of two small dims, then rollup",
)
def j01_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
    )


# --- J2: multi-key left join (reference joins ML scores back on
# (timestamp, sensor_id); here: per-(user, day) stats joined back to events).
@register(
    "j02_multikey_left_join",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             COUNT(*) AS n_day_events,
             {sql_davg('value')} AS day_avg
      FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    )
    SELECT e.event_id, e.user_id, e.value,
           d.n_day_events, d.day_avg
    FROM events e
    LEFT JOIN daily d
      ON e.user_id = d.user_id AND strftime(e.ts, '%Y-%m-%d') = d.day
    """,
    doc="J2: two-key left join of grouped stats back onto the base table",
)
def j02_multikey_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n_day_events"), davg("value").alias("day_avg")
    )
    return ev.join(daily, ["user_id", "day"], "left").select(
        "event_id", "user_id", "value", "n_day_events", "day_avg"
    )


# --- J3: star join — the dashboard query shape (reference src/app.py:90-93).
@register(
    "j03_star_join",
    oracle=f"""
    SELECT n.n_name AS nation, o.o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS revenue,
           {sql_davg('o.o_totalprice')} AS avg_order_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, o.o_orderpriority
    """,
    doc="J3: fact ⋈ dim ⋈ dim star join with grouped measures",
)
def j03_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11: fan_out measured 0.345 s -> 0.746 s (min-of-5 A/B), rejected
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            davg("o_totalprice").alias("avg_order_value"),
        )
    )


# --- J4/C3: FK resolution as set-based joins — replaces the reference's
# row-wise iterrows lookup (src/warehouse_loader_real_data.py:209-237) with
# proper equi-joins against surrogate-key dimensions.
@register(
    "j04_fk_resolution",
    oracle="""
    WITH dim_seg AS (
      SELECT c_mktsegment AS segment,
             ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS segment_key
      FROM (SELECT DISTINCT c_mktsegment FROM customer)
    ),
    dim_nat AS (
      SELECT n_nationkey, n_name,
             ROW_NUMBER() OVER (ORDER BY n_name) AS nation_key
      FROM nation
    )
    SELECT s.segment_key, nk.nation_key, COUNT(*) AS n_customers
    FROM customer c
    JOIN dim_seg s ON c.c_mktsegment = s.segment
    JOIN dim_nat nk ON c.c_nationkey = nk.n_nationkey
    GROUP BY s.segment_key, nk.nation_key
    """,
    doc="J4/C3: surrogate-key dimension build + set-based FK resolution",
)
def j04_fk_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dim_seg = (
        c.select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .withColumn("segment_key", F.row_number().over(W.orderBy("segment")))
    )
    dim_nat = n.select(
        "n_nationkey",
        F.row_number().over(W.orderBy("n_name")).alias("nation_key"),
    )
    return (
        c.join(F.broadcast(dim_seg), c.c_mktsegment == dim_seg.segment)
        .join(F.broadcast(dim_nat), c.c_nationkey == dim_nat.n_nationkey)
        .groupBy("segment_key", "nation_key")
        .agg(F.count("*").alias("n_customers"))
    )


# --- J5: date-matching join (reference src/warehouse_loader.py:265-270 —
# reading date → dim_time row; dim built inline via sequence(), see C2).
@register(
    "j05_date_join",
    oracle="""
    WITH dim_time AS (
      SELECT CAST(d AS DATE) AS date_actual,
             year(d) AS yr, month(d) AS mo,
             CASE WHEN dayofweek(d) IN (0, 6) THEN TRUE ELSE FALSE END AS is_weekend
      FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)
    )
    SELECT t.yr, t.mo, t.is_weekend, COUNT(*) AS n_events
    FROM events e
    JOIN dim_time t ON CAST(e.ts AS DATE) = t.date_actual
    GROUP BY t.yr, t.mo, t.is_weekend
    """,
    doc="J5/C2: join on derived date expr against a generated time dimension",
)
def j05_date_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim_time = spark.sql(
        """
        SELECT explode(sequence(date'2024-01-01', date'2024-12-31')) AS date_actual
        """
    ).select(
        "date_actual",
        F.year("date_actual").alias("yr"),
        F.month("date_actual").alias("mo"),
        F.dayofweek("date_actual").isin([1, 7]).alias("is_weekend"),
    )
    return (
        ev.join(F.broadcast(dim_time), F.to_date("ts") == F.col("date_actual"))
        .groupBy("yr", "mo", "is_weekend")
        .agg(F.count("*").alias("n_events"))
    )


# --- J6: LATERAL-join rewrite (sql/enhanced_data_schema.sql:421-433):
# "latest reading + trailing-24h stats per sensor" as one aggregate pass
# with max_by + conditional aggs — no correlated subquery, no re-scan.
@register(
    "j06_lateral_rewrite",
    oracle=f"""
    SELECT user_id,
           arg_max(value, ts) AS latest_value,
           arg_max(event_type, ts) AS latest_type,
           COUNT(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-30 00:00:00') AS n_last_day,
           {sql_davg("CASE WHEN ts >= TIMESTAMP '2024-01-30 00:00:00' THEN value END")} AS avg_last_day
    FROM events
    GROUP BY user_id
    """,
    doc="J6: LATERAL correlated-subquery rewritten as max_by + filtered aggs",
)
def j06_lateral_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-30 00:00:00").cast("timestamp")
    recent = F.when(F.col("ts") >= cutoff, F.col("value"))
    return ev.groupBy("user_id").agg(
        F.max_by("value", "ts").alias("latest_value"),
        F.max_by("event_type", "ts").alias("latest_type"),
        F.count(F.when(F.col("ts") >= cutoff, 1)).alias("n_last_day"),
        davg(recent).alias("avg_last_day"),
    )


# --- J7 + semi/anti joins (engine surface beyond the reference: EXISTS /
# NOT EXISTS without materializing the subquery).
@register(
    "j07_semi_anti",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) FILTER (WHERE has_order) AS with_orders,
           COUNT(*) FILTER (WHERE NOT has_order) AS without_orders
    FROM (
      SELECT c.c_mktsegment,
             EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
      FROM customer c
    )
    GROUP BY c_mktsegment
    """,
    doc="J7: left-semi/left-anti joins (EXISTS / NOT EXISTS)",
)
def j07_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    okeys = o.select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(okeys, "c_custkey", "left_semi").groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(F.count("*").alias("with_orders"))
    anti = c.join(okeys, "c_custkey", "left_anti").groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(F.count("*").alias("without_orders"))
    return (
        semi.join(anti, "segment", "full_outer")
        .select(
            "segment",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


# --- J8: union-then-join enrich (reference src/enhanced_spark_etl.py:427-437
# unions per-type prediction frames then left-joins back to the base).
@register(
    "j08_union_then_join",
    oracle=f"""
    WITH scored AS (
      SELECT event_id, value * 2.0 AS score FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT event_id, value * 0.5 AS score FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_type, COUNT(s.score) AS n_scored,
           {sql_dsum('s.score')} AS total_score
    FROM events e LEFT JOIN scored s ON e.event_id = s.event_id
    GROUP BY e.event_type
    """,
    doc="J8: per-branch processing unioned then joined back (left enrich)",
)
def j08_union_then_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", (F.col("value") * 2.0).alias("score")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", (F.col("value") * 0.5).alias("score")
    )
    scored = errors.unionByName(purchases)
    return (
        ev.join(scored, "event_id", "left")
        .groupBy("event_type")
        .agg(F.count("score").alias("n_scored"), dsum("score").alias("total_score"))
    )


# ---------------------------------------------------------------------------
# Extensions: as-of join and range join (SURVEY §2.3 note: "as-of joins
# become relevant for sensor-reading ⨝ weather-context"; Spark lacks both).
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group.

    Idiomatic-Spark implementation (no nested-loop join): tag and union the
    two inputs, sort within ``by`` partitions, carry the last non-null right
    value forward with ``last(..., ignorenulls=True)``, keep left rows. One
    shuffle + one sort — the same cost as a sort-merge join, independent of
    time-gap sizes. At 100 TB this beats a non-equi join (which Spark plans
    as BroadcastNestedLoop) by orders of magnitude.
    """
    lt = left.withColumn("__side", F.lit(1))
    rt = right.withColumn("__side", F.lit(0))
    cols = list(dict.fromkeys(left.columns + right.columns))
    lt = lt.select(
        *[F.col(c) if c in left.columns else F.lit(None).alias(c) for c in cols],
        "__side",
    )
    rt = rt.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c) for c in cols],
        "__side",
    )
    u = lt.unionByName(rt)
    # right rows sort before left rows at the same instant => "<=" semantics
    w = W.partitionBy(by).orderBy(F.col(on).asc(), F.col("__side").asc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    for rc in right_cols:
        u = u.withColumn(rc, F.last(rc, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__side")


# Shared user-day anchor stream for the as-of family (j09/j12): first
# event of each user-day. The min_by ordering key appends event_id to the
# microsecond timestamp (zero-padded string: lexicographic == numeric) so
# two events sharing an exact (user_id, ts) can never make the two
# engines pick different anchor values.
SQL_USER_DAY_ANCHORS = (
    "SELECT user_id, min(ts) AS a_ts, "
    "min_by(value, printf('%018d%012d', epoch_us(ts), event_id)) "
    "AS anchor_value "
    "FROM events GROUP BY user_id, time_bucket(INTERVAL 1 DAY, ts)"
)


def user_day_anchors(ev: DataFrame) -> DataFrame:
    ord_key = F.format_string(
        "%018d%012d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    return (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.min("ts").alias("a_ts"),
            F.min_by("value", ord_key).alias("anchor_value"),
        )
        .select("user_id", "a_ts", "anchor_value")
    )


@register(
    "j09_asof_join",
    oracle=f"""
    WITH anchors AS ({SQL_USER_DAY_ANCHORS})
    SELECT e.event_id, e.user_id, e.value, a.anchor_value
    FROM events e
    ASOF LEFT JOIN anchors a ON e.user_id = a.user_id AND e.ts >= a.a_ts
    """,
    doc="extension: as-of join via union + last-value carry-forward (vs DuckDB ASOF)",
)
def j09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # right side: first event of each user-day = the "state" stream
    anchors = user_day_anchors(ev).select(
        "user_id", F.col("a_ts").alias("ts"), "anchor_value"
    )
    left = ev.select("event_id", "ts", "user_id", "value")
    joined = asof_join(left, anchors, on="ts", by="user_id", right_cols=["anchor_value"])
    return joined.select("event_id", "user_id", "value", "anchor_value")


def bucketized_neighbor_counts(
    probes_df: DataFrame, base_df: DataFrame, window_sec: int
) -> DataFrame:
    """Generic bucketized range join: for each probe row, count base rows
    of the same user within ±window_sec.

    Bucketize the time axis into window_sec cells; a ±window_sec window
    can only reach the adjacent cells, so the non-equi range join becomes
    an equi-join on (user_id, bucket) over 3 replicated buckets + a
    residual BETWEEN filter — linear work instead of the quadratic
    BroadcastNestedLoop a raw range predicate would produce.

    Both inputs need (event_id, user_id, ts) columns; returns
    (event_id, n_nearby) for probes with ≥1 neighbor.
    """
    sec = F.col("ts").cast("long")
    bucket = F.floor(sec / window_sec).cast("long")
    probes = probes_df.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        sec.alias("e_sec"),
        bucket.alias("e_bucket"),
    ).withColumn(
        "probe_bucket",
        F.explode(
            F.array(F.col("e_bucket") - 1, F.col("e_bucket"), F.col("e_bucket") + 1)
        ),
    )
    base = base_df.select(
        F.col("event_id").alias("o_id"),
        F.col("user_id").alias("o_user"),
        sec.alias("o_sec"),
        bucket.alias("o_bucket"),
    )
    return (
        probes.join(
            base,
            (probes.e_user == base.o_user) & (probes.probe_bucket == base.o_bucket),
        )
        .filter(
            (F.col("o_sec") >= F.col("e_sec") - window_sec)
            & (F.col("o_sec") <= F.col("e_sec") + window_sec)
            & (F.col("o_id") != F.col("e_id"))
        )
        .groupBy(F.col("e_id").alias("event_id"))
        .agg(F.count("*").alias("n_nearby"))
    )


@register(
    "j10_range_join",
    oracle="""
    SELECT e.event_id,
           COUNT(o.event_id) AS n_nearby
    FROM events e
    JOIN events o
      ON e.user_id = o.user_id
     AND o.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
     AND o.event_id <> e.event_id
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
    doc="extension: range join as ONE per-user RANGE window (probes are a "
    "subset of the base stream, so the bucketized self-join collapses to "
    "a value-range frame count: one exchange, no join)",
)
def j10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±5-minute same-user neighbor count for error events.

    r11 optimization (guide §2.4 — remove shuffles outright): the probe
    side (errors) is a SUBSET of the base side (all events), so the
    bucketized equi-join (:func:`bucketized_neighbor_counts`, kept for
    the general two-table case) degenerates to a per-user RANGE window:
    ``count over (partition by user_id order by sec range ±300) - 1``
    counts exactly the same-user rows with truncated-second distance
    <= 300 excluding self — the join's ``o_id != e_id`` predicate —
    and the errors-only filter runs after the window. One exchange on
    user_id instead of three (probes ×3 bucket fan-out, base, groupBy)
    and zero joins; arithmetic is the identical ``cast(ts as long)``
    BETWEEN, so every row matches the joined form bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    wr = W.partitionBy("user_id").orderBy("sec").rangeBetween(-300, 300)
    counted = ev.select(
        "event_id", "user_id", "event_type", sec.alias("sec")
    ).withColumn("n_nearby", F.count("*").over(wr) - 1)
    return counted.filter(
        (F.col("event_type") == "error") & (F.col("n_nearby") > 0)
    ).select("event_id", "n_nearby")


OVERLAP_SPAN_DAYS = 7  # order fulfillment window length (bounded => the
# bucket explode fans each interval to at most 2 weekly buckets)


@register(
    "j11_interval_overlap_join",
    oracle=f"""
    WITH ord AS (
      SELECT o_orderkey, o_totalprice,
             o_orderdate AS o_start,
             o_orderdate + INTERVAL {OVERLAP_SPAN_DAYS} DAYS AS o_end
      FROM orders
    ),
    win AS (
      SELECT CAST(r.range AS BIGINT) AS win_id,
             TIMESTAMP '1992-01-01 00:00:00'
               + CAST(r.range AS INT) * INTERVAL 28 DAYS AS w_start,
             TIMESTAMP '1992-01-01 00:00:00'
               + CAST(r.range AS INT) * INTERVAL 28 DAYS
               + INTERVAL 14 DAYS AS w_end
      FROM range(0, 92) r
    )
    SELECT w.win_id,
           strftime(w.w_start, '%Y-%m-%d') AS w_start,
           COUNT(o.o_orderkey) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total_price
    FROM win w
    JOIN ord o ON o.o_start < w.w_end AND w.w_start < o.o_end
    GROUP BY w.win_id, w.w_start
    """,
    doc="J11 (ext.): interval-overlap join — bounded-length order windows "
    "vs a biweekly maintenance-window dimension. The naive overlap "
    "predicate is a nested loop; here each order interval explodes to the "
    "(at most 2, since span <= bucket width) 28-day buckets it touches, "
    "the join runs as a hash equi-join on the bucket, and the exact "
    "overlap predicate filters within buckets — the temporal-join shape "
    "that stays linear at 100 TB",
)
def j11_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = "TIMESTAMP '1992-01-01 00:00:00'"
    bucket_days = 28
    ord_ = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").alias("o_start"),
            (F.col("o_orderdate") + F.expr(f"INTERVAL {OVERLAP_SPAN_DAYS} DAYS")).alias(
                "o_end"
            ),
        )
        # bucket ids this interval touches: floor-div of day offsets
        # (datediff sidesteps TIMESTAMP_NTZ's no-direct-epoch-cast rule)
        .withColumn(
            "b0",
            F.floor(F.datediff(F.col("o_start"), F.lit("1992-01-01")) / bucket_days),
        )
        .withColumn(
            "b1",
            F.floor(F.datediff(F.col("o_end"), F.lit("1992-01-01")) / bucket_days),
        )
        .withColumn("bucket", F.explode(F.sequence("b0", "b1")))
    )
    win = spark.range(0, 92).select(
        F.col("id").alias("win_id"),
        (F.expr(epoch) + F.col("id").cast("int") * F.expr("INTERVAL 28 DAYS")).alias(
            "w_start"
        ),
        (
            F.expr(epoch)
            + F.col("id").cast("int") * F.expr("INTERVAL 28 DAYS")
            + F.expr("INTERVAL 14 DAYS")
        ).alias("w_end"),
    )
    # each window lives entirely inside its own 28-day bucket
    win = win.withColumn("bucket", F.col("win_id"))
    joined = ord_.join(F.broadcast(win), "bucket").filter(
        (F.col("o_start") < F.col("w_end")) & (F.col("w_start") < F.col("o_end"))
    )
    return (
        joined.groupBy("win_id", F.date_format("w_start", "yyyy-MM-dd").alias("w_start"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# --- J12 (ext.): nearest-as-of join (bidirectional, with tolerance) ----------

# j09 answers "most recent state at or before t"; sensor/trade alignment
# often wants the NEAREST reading in either direction within a tolerance
# (pandas merge_asof direction='nearest'). One union of events+anchors,
# one shuffle/sort per user on the epoch seconds, then two RANGE-framed
# carries over that single ordering (last anchor at-or-before, first
# anchor at-or-after) and a tie-broken pick — never a non-equi nested
# loop, and no re-join back to the event stream. Ties (equal distance)
# resolve backward, matching merge_asof.
NEAREST_TOL_SEC = 12 * 3600


@register(
    "j12_nearest_asof",
    oracle=f"""
    WITH anchors AS (
      SELECT user_id, a_ts, anchor_value,
             CAST(FLOOR(epoch(a_ts)) AS BIGINT) AS a_sec
      FROM ({SQL_USER_DAY_ANCHORS})
    ),
    e AS (
      SELECT event_id, user_id, value,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    back AS (
      SELECT e.event_id, a.a_sec AS back_sec, a.anchor_value AS back_value
      FROM e ASOF LEFT JOIN anchors a
        ON e.user_id = a.user_id AND e.sec >= a.a_sec
    ),
    fwd AS (
      SELECT e.event_id, a.a_sec AS fwd_sec, a.anchor_value AS fwd_value
      FROM e ASOF LEFT JOIN (SELECT user_id, anchor_value, a_sec, -a_sec AS neg
                             FROM anchors) a
        ON e.user_id = a.user_id AND -e.sec >= a.neg
    )
    SELECT event_id, user_id, value, anchor_value, direction,
           dt_sec FROM (
      SELECT e.event_id, e.user_id, e.value,
             CASE WHEN back_sec IS NOT NULL
                       AND (fwd_sec IS NULL
                            OR e.sec - back_sec <= fwd_sec - e.sec)
                  THEN back_value ELSE fwd_value END AS anchor_value,
             CASE WHEN back_sec IS NOT NULL
                       AND (fwd_sec IS NULL
                            OR e.sec - back_sec <= fwd_sec - e.sec)
                  THEN 'backward' ELSE 'forward' END AS direction,
             CASE WHEN back_sec IS NOT NULL
                       AND (fwd_sec IS NULL
                            OR e.sec - back_sec <= fwd_sec - e.sec)
                  THEN e.sec - back_sec ELSE fwd_sec - e.sec END AS dt_sec
      FROM e JOIN back USING (event_id) JOIN fwd USING (event_id)
    ) WHERE dt_sec IS NOT NULL AND dt_sec <= {NEAREST_TOL_SEC}
    """,
    doc="J12 (ext.): nearest-as-of join — nearest user-day anchor in "
    "EITHER direction within a 12h tolerance (merge_asof "
    "direction='nearest'); two union+carry passes (backward on epoch "
    "seconds, forward on their negation), ties resolve backward. One "
    "shuffle+sort per direction at any scale",
)
def j12_nearest_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchors = user_day_anchors(ev).select(
        "user_id",
        F.col("a_ts").cast("long").alias("sec"),
        F.col("a_ts").cast("long").alias("asec"),
        F.col("anchor_value").alias("aval"),
    )
    left = ev.select(
        "event_id", "user_id", "value", F.col("ts").cast("long").alias("sec")
    )
    # ONE union + ONE shuffle/sort serves BOTH directions: RANGE frames
    # over the same (user, sec) ordering carry the last anchor at-or-
    # before (backward) and the first anchor at-or-after (forward) —
    # inclusive on ties in both directions — with no event-cardinality
    # re-joins (two asof passes + two hash joins would double the
    # shuffled bytes for identical output)
    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "asec", F.lit(None).cast("long")
    ).withColumn("aval", F.lit(None).cast("double"))
    rt = anchors.select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.lit(None).cast("double").alias("value"),
        "sec",
        F.lit(0).alias("__side"),
        "asec",
        "aval",
    )
    u = lt.select(rt.columns).unionByName(rt)
    wb = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(0, W.unboundedFollowing)
    )
    j = (
        u.withColumn("back_sec", F.last("asec", ignorenulls=True).over(wb))
        .withColumn("back_value", F.last("aval", ignorenulls=True).over(wb))
        .withColumn("fwd_sec", F.first("asec", ignorenulls=True).over(wf))
        .withColumn("fwd_value", F.first("aval", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )
    take_back = F.col("back_sec").isNotNull() & (
        F.col("fwd_sec").isNull()
        | (F.col("sec") - F.col("back_sec") <= F.col("fwd_sec") - F.col("sec"))
    )
    out = j.select(
        "event_id",
        "user_id",
        "value",
        F.when(take_back, F.col("back_value")).otherwise(F.col("fwd_value"))
        .alias("anchor_value"),
        F.when(take_back, "backward").otherwise("forward").alias("direction"),
        F.when(take_back, F.col("sec") - F.col("back_sec"))
        .otherwise(F.col("fwd_sec") - F.col("sec"))
        .alias("dt_sec"),
    )
    return out.filter(
        F.col("dt_sec").isNotNull() & (F.col("dt_sec") <= NEAREST_TOL_SEC)
    )


# --- j13 (ext.): point-in-time SCD2 dimension lookup -------------------------

_PIT_FLIP = "2024-01-15 00:00:00"  # mid-January: the events straddle it


@register(
    "j13_pit_scd2_lookup",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey AS user_id, c_mktsegment AS seg,
             TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             TIMESTAMP '{_PIT_FLIP}' AS valid_to
      FROM customer WHERE c_custkey < 150
      UNION ALL
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN 'UPGRADED'
                  ELSE c_mktsegment END,
             TIMESTAMP '{_PIT_FLIP}',
             TIMESTAMP '9999-12-31 00:00:00'
      FROM customer WHERE c_custkey < 150
    )
    SELECT d.seg,
           strftime(e.ts, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           {sql_dsum('e.value')} AS sum_value
    FROM events e
    JOIN dim d ON d.user_id = e.user_id
             AND e.ts >= d.valid_from AND e.ts < d.valid_to
    GROUP BY d.seg, strftime(e.ts, '%Y-%m-%d')
    """,
    doc="j13 (ext.): point-in-time SCD2 lookup — every fact row joins the "
    "dimension VERSION valid at its event time (equality on the key plus "
    "valid_from <= ts < valid_to), the standard as-was reporting join "
    "against a type-2 dimension (c04's shape). The fixture dimension "
    "flips segment assignments mid-month so the two versions genuinely "
    "partition the fact stream. Scale shape: the versioned dim is "
    "|keys| x versions rows — broadcast; the range predicate rides the "
    "equality hash join as a post-join filter, so facts never shuffle. "
    "Exactness: counts + exact decimal sums. Reference analog: "
    "sql/dimensional_schema.sql:43-48 reserved SCD2 columns",
)
def j13_pit_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
    flip = F.lit(_PIT_FLIP).cast("timestamp")
    v1 = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        flip.alias("valid_to"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.when(F.col("c_custkey") % 3 == 0, "UPGRADED")
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        flip.alias("valid_from"),
        F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    joined = ev.join(
        F.broadcast(dim),
        (ev["user_id"] == dim["user_id"])
        & (ev["ts"] >= dim["valid_from"])
        & (ev["ts"] < dim["valid_to"]),
    )
    return joined.groupBy(
        "seg", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    )


# --- j14 (ext.): temporal anti-join (order abandonment) -----------------------------


@register(
    "j14_temporal_anti_join",
    # The anti-join twin of p16's EXISTS: orders with NO line item
    # shipped within 60 days of the order date — a key-equality anti
    # join whose extra condition is a cross-table date comparison
    # riding the join, counted by order status. The dual condition
    # (key match AND in-window) must live IN the join: filtering
    # after a plain anti join would change the semantics.
    oracle="""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_abandoned
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderstatus
    """,
    doc="j14 (ext.): temporal anti-join — orders with no shipment "
    "within 60 days of order placement ('abandoned'), counted by "
    "status: a LEFT ANTI hash join on the order key whose in-window "
    "date comparison is a JOIN-side condition (post-join filtering "
    "would wrongly drop orders that shipped late AND on time on "
    "different lines). Completes the temporal-join family "
    "(j09 as-of, j11 overlap, j12 nearest, j13 point-in-time) with "
    "the absence-within-window shape compliance/abandonment reports "
    "need. Scale: both scans project two columns; one key-"
    "partitioned anti join; 3-row aggregate. Exactness: integer "
    "counts",
)
def j14_temporal_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    abandoned = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_anti",
    )
    return abandoned.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_abandoned")
    )


# --- j15 (ext.): null-safe equality join ---------------------------------------------


@register(
    "j15_null_safe_join",
    # NULL join keys: standard equality drops them (NULL = NULL is
    # UNKNOWN); the null-safe operator (Spark <=>, SQL IS NOT DISTINCT
    # FROM) matches them as one group. Keys are derived with NULLIF so
    # the fixture has real NULLs: customers and orders bucketed by
    # nation-mod-5 with bucket 0 nulled out.
    oracle="""
    WITH c AS (
      SELECT NULLIF(c_nationkey % 5, 0) AS k, COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    o AS (
      SELECT NULLIF(o.o_custkey % 5, 0) AS k, COUNT(*) AS n_ord
      FROM orders o GROUP BY 1
    )
    SELECT c.k AS bucket, CAST(c.n_cust AS BIGINT) AS n_cust,
           CAST(o.n_ord AS BIGINT) AS n_ord
    FROM c JOIN o ON c.k IS NOT DISTINCT FROM o.k
    """,
    doc="j15 (ext.): null-safe equality join — the <=> operator "
    "(IS NOT DISTINCT FROM) matches NULL keys as a single group where "
    "plain equality silently drops every NULL-keyed row, the classic "
    "silent-data-loss bug in key-repair pipelines. Fixture derives "
    "NULLable buckets with NULLIF; both sides pre-aggregate to the "
    "6-row bucket grid before the join, so the null-safe comparison "
    "runs on bounded inputs (at scale: null-safe joins hash NULL like "
    "any value — no skew surprise beyond what the null count itself "
    "implies, which IS the operational point). Exactness: integer "
    "counts. Ref parity: the reference's nullable-key sensor joins "
    "(src/etl.py:65-80)",
)
def j15_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k")
    ).groupBy("k").agg(F.count("*").cast("bigint").alias("n_cust"))
    od = load_table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_custkey") % 5, F.lit(0)).alias("ok")
    ).groupBy("ok").agg(F.count("*").cast("bigint").alias("n_ord"))
    return (
        cu.join(od, F.col("k").eqNullSafe(F.col("ok")))
        .select(F.col("k").alias("bucket"), "n_cust", "n_ord")
    )


# --- j16 (ext.): blocked fuzzy self-join (edit-distance candidate pairs) ---------------


@register(
    "j16_blocked_fuzzy_join",
    # Fuzzy matching at scale is a BLOCKING problem: the naive all-pairs
    # edit-distance scan is O(n^2) and unshippable at 100 TB, so
    # candidate pairs are generated only inside (first-token, exact
    # char-length) blocks — one hash equi-join — and Levenshtein runs
    # only on the candidates. Classic entity-resolution shape. Pruning
    # is lossless ONLY for the lev = 0 duplicate tier (lev >=
    # |len_a - len_b|, so exact duplicates always share a length block);
    # the n_near tier (lev 1-4) counts substitution-only near-duplicates
    # within equal-length blocks and by construction misses insertion/
    # deletion neighbors whose lengths differ — a recall/cost dial, not
    # a lossless guarantee (ADVICE r9). Levenshtein is
    # byte-identical across Spark and DuckDB (verified pairwise);
    # counts are exact integers, so no rounding device.
    oracle="""
    WITH b AS (
      SELECT p_partkey AS k, p_name AS nm,
             string_split(p_name, ' ')[1] AS w0,
             CAST(LENGTH(p_name) AS BIGINT) AS ln
      FROM part
    ),
    names AS (
      SELECT w0, ln, CAST(COUNT(*) AS BIGINT) AS n_names
      FROM b GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.w0, a.ln, levenshtein(a.nm, b2.nm) AS lev
      FROM b a JOIN b b2
        ON a.w0 = b2.w0 AND a.ln = b2.ln AND a.k < b2.k
    ),
    agg AS (
      SELECT w0, ln,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN lev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup,
             CAST(SUM(CASE WHEN lev BETWEEN 1 AND 4 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_near,
             CAST(MIN(CASE WHEN lev > 0 THEN lev END) AS BIGINT)
               AS min_nonzero_lev
      FROM pairs GROUP BY 1, 2
    )
    SELECT n.w0 AS block_word, n.ln AS name_len, n.n_names,
           COALESCE(a.n_pairs, 0) AS n_pairs,
           COALESCE(a.n_dup, 0) AS n_dup,
           COALESCE(a.n_near, 0) AS n_near,
           a.min_nonzero_lev
    FROM names n LEFT JOIN agg a
      ON n.w0 = a.w0 AND n.ln = a.ln
    """,
    doc="j16 (ext.): blocked fuzzy self-join over part names — "
    "entity-resolution candidate pairing with (first-token, exact "
    "length) blocking, then Levenshtein only within blocks: exact "
    "duplicates, near-duplicates (lev 1-4) and the tightest nonzero "
    "distance per block. The all-pairs scan is O(n^2); blocking "
    "makes it one hash equi-join whose cost is sum of block-size^2 "
    "— the shape that keeps fuzzy dedup shippable at 100 TB (skewed "
    "blocks would get a second blocking key, the documented scale "
    "path). Complements f15 (the scalar edit-distance function) and "
    "d01-d03 (exact-key dedup) with the approximate-key tier. "
    "Ref parity: duplicate-meter detection (src/etl.py:117-131)",
)
def j16_blocked_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    # r11 (guide §2.6): the within-block Levenshtein evaluation happens on
    # the PROBE side of a broadcast self-join, i.e. in the scan stage — a
    # one-split local scan would run every pairwise edit distance on one
    # core. fan_out spreads the probe stream; no-op at scale.
    b = fan_out(load_table(spark, sf_dir, "part"), spark).select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("nm"),
        F.split(F.col("p_name"), " ").getItem(0).alias("w0"),
        F.length("p_name").cast("bigint").alias("ln"),
    )
    names = b.groupBy("w0", "ln").agg(F.count("*").cast("bigint").alias("n_names"))
    right = b.select(
        F.col("k").alias("k2"),
        F.col("nm").alias("nm2"),
        F.col("w0").alias("w02"),
        F.col("ln").alias("ln2"),
    )
    pairs = b.join(
        right,
        (F.col("w0") == F.col("w02"))
        & (F.col("ln") == F.col("ln2"))
        & (F.col("k") < F.col("k2")),
    ).select("w0", "ln", F.levenshtein("nm", "nm2").alias("lev"))
    agg = pairs.groupBy("w0", "ln").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("lev") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup"),
        F.sum(F.when(F.col("lev").between(1, 4), 1).otherwise(0))
        .cast("bigint")
        .alias("n_near"),
        F.min(F.when(F.col("lev") > 0, F.col("lev")))
        .cast("bigint")
        .alias("min_nonzero_lev"),
    )
    return (
        names.join(agg, ["w0", "ln"], "left")
        .select(
            F.col("w0").alias("block_word"),
            F.col("ln").alias("name_len"),
            "n_names",
            F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
            F.coalesce("n_dup", F.lit(0).cast("bigint")).alias("n_dup"),
            F.coalesce("n_near", F.lit(0).cast("bigint")).alias("n_near"),
            "min_nonzero_lev",
        )
    )


# --- j17 (ext.): interval coalesce (temporal-algebra span merge) -------------------------


def coalesce_spans(ivw: DataFrame) -> DataFrame:
    """Coalesce a weighted (user_id, s, e, w) interval table into maximal
    disjoint spans (user_id, span_start, span_end, n_intervals = sum w).

    The running-max island device: an interval starts a NEW span iff its
    start exceeds the max end of ALL earlier intervals (ORDER BY s, e) —
    plain lag(e) breaks on nested intervals (a long interval fully
    containing later short ones), which is exactly what distinguishes
    interval algebra from t03's point-gap sessionization. Coalesce is
    associative and idempotent on interval sets, and carrying w makes it
    WEIGHT-mergeable too — t36's streaming state relies on both."""
    from pyspark.sql import Window as W

    wp = W.partitionBy("user_id").orderBy("s", "e")
    ordd = ivw.withColumn(
        "prev_max_e",
        F.max("e").over(wp.rowsBetween(W.unboundedPreceding, -1)),
    )
    isl = ordd.withColumn(
        "new_span",
        F.when(
            F.col("prev_max_e").isNull()
            | (F.col("s") > F.col("prev_max_e")),
            1,
        ).otherwise(0),
    )
    grp = isl.withColumn(
        "span_id",
        F.sum("new_span").over(wp.rowsBetween(W.unboundedPreceding, 0)),
    )
    return grp.groupBy("user_id", "span_id").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.sum("w").cast("bigint").alias("n_intervals"),
    )


def interval_coalesce_report(iv: DataFrame) -> DataFrame:
    """j17's finalize from a (user_id, s, e) interval table — shared with
    t36's streaming state maintainer (re-coalescing state ∪ new partials
    equals the batch answer under any slicing)."""
    spans = coalesce_spans(iv.withColumn("w", F.lit(1)))
    return spans.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum("n_intervals").cast("bigint").alias("n_intervals"),
        F.sum(F.col("span_end") - F.col("span_start"))
        .cast("bigint")
        .alias("covered_sec"),
        F.max(F.col("span_end") - F.col("span_start"))
        .cast("bigint")
        .alias("longest_span_sec"),
    )


_J17_ORACLE = """
    WITH iv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + 60 * (1 + event_id % 10) AS e
      FROM events
    ),
    ordd AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max_e
      FROM iv
    ),
    isl AS (
      SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                     THEN 1 ELSE 0 END AS new_span
      FROM ordd
    ),
    grp AS (
      SELECT *, SUM(new_span) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS UNBOUNDED PRECEDING) AS span_id
      FROM isl
    ),
    spans AS (
      SELECT user_id, span_id, MIN(s) AS span_start, MAX(e) AS span_end,
             COUNT(*) AS n_intervals
      FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
           CAST(SUM(span_end - span_start) AS BIGINT) AS covered_sec,
           CAST(MAX(span_end - span_start) AS BIGINT) AS longest_span_sec
    FROM spans GROUP BY user_id
"""


def _j17_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("s"),
        (
            F.floor(F.unix_timestamp("ts")).cast("bigint")
            + 60 * (1 + F.col("event_id") % 10)
        )
        .cast("bigint")
        .alias("e"),
    )
    return ev


@register(
    "j17_interval_coalesce",
    # Temporal-algebra span merge: coalesce each user's VARIABLE-LENGTH
    # intervals (duration planted deterministically as
    # 60*(1 + event_id % 10) seconds, so intervals overlap AND nest)
    # into maximal disjoint spans. Nesting is the point: t03's
    # point-gap sessionization (lag-based) cannot merge an interval
    # that lies wholly inside an earlier long one — the running-max
    # island device (max(e) over all EARLIER rows) can. The per-user
    # coverage/span stats are the utilization-and-SLA shape every
    # temporal warehouse asks of validity intervals. One user-hash
    # exchange serves both windows and the span reduce. All integers.
    oracle=_J17_ORACLE,
    doc="j17 (ext.): interval coalesce — merge each user's overlapping "
    "AND nested variable-length intervals into maximal disjoint spans "
    "via the running-max island device, then per-user span count, "
    "interval count, covered seconds and longest span. The temporal-"
    "algebra primitive behind SLA coverage, downtime merging and "
    "SCD-gap auditing that point-gap sessionization (t03) cannot "
    "express once intervals nest. Scale: one hash exchange on "
    "user_id shared by both windows and the reduce; no self-join, no "
    "sort beyond the per-user frame. Exactness: all-BIGINT arithmetic",
)
def j17_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interval_coalesce_report(_j17_intervals(spark, sf_dir))


# --- j18 (ext.): interval gaps — the complement of j17's coalesce -----------------------

_J18_IDLE = (
    "ROUND(CAST(total_gap_sec AS DOUBLE)"
    " / CAST(covered_sec + total_gap_sec AS DOUBLE), 6)"
)

_J18_ORACLE = f"""
    WITH iv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + 60 * (1 + event_id % 10) AS e
      FROM events
    ),
    ordd AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max_e
      FROM iv
    ),
    isl AS (
      SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                     THEN 1 ELSE 0 END AS new_span
      FROM ordd
    ),
    grp AS (
      SELECT *, SUM(new_span) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS UNBOUNDED PRECEDING) AS span_id
      FROM isl
    ),
    spans AS (
      SELECT user_id, span_id, MIN(s) AS span_start, MAX(e) AS span_end
      FROM grp GROUP BY 1, 2
    ),
    gaps AS (
      SELECT user_id, span_end - span_start AS cov,
             span_start - LAG(span_end) OVER (PARTITION BY user_id
                                              ORDER BY span_start) AS gap
      FROM spans
    )
    SELECT user_id,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS total_gap_sec,
           CAST(MAX(gap) AS BIGINT) AS max_gap_sec,
           CAST(SUM(cov) AS BIGINT) AS covered_sec,
           {_J18_IDLE} AS idle_ratio
    FROM gaps GROUP BY user_id
"""


@register(
    "j18_interval_gaps",
    # The COMPLEMENT of j17: after coalescing each user's intervals
    # into maximal spans, measure the HOLES — gap count, total/max idle
    # seconds between consecutive spans, and the idle ratio over the
    # observed horizon. j17 answers "how much was covered"; j18 answers
    # "where wasn't it, and how badly" — the downtime/SLA-breach shape.
    # Same single user_id exchange: the island windows, the span
    # reduce and the gap lag all ride one partitioning. All-BIGINT
    # except the one shared-string idle ratio. Gaps are >= 1 s by
    # construction (touching intervals coalesce), so COUNT(gap)
    # counts true holes; LAG's first-row NULL drops out of COUNT/SUM
    # identically on both engines.
    oracle=_J18_ORACLE,
    doc="j18 (ext.): interval gaps — per-user holes between j17's "
    "coalesced spans: gap count, total and maximum idle seconds, and "
    "the idle share of the covered+idle horizon. The downtime/"
    "SLA-breach complement of j17's coverage report (together they "
    "partition each user's timeline exactly). One user_id exchange "
    "serves the island device, the span reduce and the gap lag. "
    "Exactness: all-BIGINT; the idle ratio is one shared double "
    "string. No reference analog — extension per brief",
)
def j18_interval_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("s"),
        (
            F.floor(F.unix_timestamp("ts")).cast("bigint")
            + 60 * (1 + F.col("event_id") % 10)
        )
        .cast("bigint")
        .alias("e"),
    )
    spans = coalesce_spans(iv.withColumn("w", F.lit(1)))
    wg = W.partitionBy("user_id").orderBy("span_start")
    gaps = spans.select(
        "user_id",
        (F.col("span_end") - F.col("span_start")).alias("cov"),
        (F.col("span_start") - F.lag("span_end").over(wg)).alias("gap"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.coalesce(F.sum("gap"), F.lit(0)).cast("bigint")
        .alias("total_gap_sec"),
        F.max("gap").cast("bigint").alias("max_gap_sec"),
        F.sum("cov").cast("bigint").alias("covered_sec"),
    ).withColumn("idle_ratio", F.expr(_J18_IDLE))


# --- j19 (ext.): Allen interval-algebra relation histogram ------------------------------

# One shared CASE chain classifying (prev, cur) session intervals into
# Allen's relations. The window orders by (s, e, event_id), so prev.s <=
# cur.s and, on equal starts, prev.e <= cur.e — exactly the 7 canonical
# relations are reachable (precedes/meets/overlaps/finished_by/contains/
# starts/equals; the 6 converses need prev to start later, which the
# ordering forbids) and the chain is exhaustive. Pure BIGINT compares.
_J19_REL = (
    "CASE WHEN pe < cs THEN 'precedes' "
    "WHEN pe = cs THEN 'meets' "
    "WHEN ps < cs AND pe < ce THEN 'overlaps' "
    "WHEN ps < cs AND pe = ce THEN 'finished_by' "
    "WHEN ps < cs AND pe > ce THEN 'contains' "
    "WHEN ps = cs AND pe < ce THEN 'starts' "
    "ELSE 'equals' END"
)
_J19_OVL = "GREATEST(LEAST(pe, ce) - cs, 0)"


@register(
    "j19_allen_relations",
    # HOW do a user's successive sessions relate in time? j17 merges
    # overlapping spans and j18 measures the gaps; j19 CLASSIFIES each
    # successive interval pair into Allen's interval algebra — the
    # vocabulary of temporal QA (how much of the stream overlaps vs
    # meets vs nests tells you whether sessionization thresholds are
    # sane and whether "concurrent session" alerts would fire). Linear
    # device: NO pair join — one lag window per user over (s, e,
    # event_id) yields each interval's predecessor, one shared CASE
    # chain labels the pair, and the ordering argument makes exactly
    # the 7 canonical relations exhaustive. Everything is BIGINT
    # second arithmetic; no rounding device needed anywhere. Scale:
    # one shuffle on user_id, windows linear per user — never the
    # quadratic all-pairs a naive Allen classifier implies.
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + 60 * (1 + event_id % 10) AS e
      FROM events
    ),
    lagged AS (
      SELECT user_id,
             LAG(s) OVER w AS ps, LAG(e) OVER w AS pe,
             s AS cs, e AS ce
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id)
    ),
    pairs AS (
      SELECT user_id, {_J19_REL} AS relation,
             CAST({_J19_OVL} AS BIGINT) AS ovl
      FROM lagged WHERE ps IS NOT NULL
    )
    SELECT relation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(ovl) AS BIGINT) AS total_overlap_sec
    FROM pairs GROUP BY relation
    """,
    doc="j19 (ext.): Allen interval-algebra histogram — each user's "
    "successive session intervals classified into the 7 canonical "
    "Allen relations (precedes / meets / overlaps / finished_by / "
    "contains / starts / equals) with pair counts, distinct users "
    "and total overlapped seconds per relation. Completes the "
    "temporal-algebra family: j11 joins overlaps, j17 merges them, "
    "j18 measures gaps, j19 names the relationships. The classifier "
    "is ONE lag window + ONE shared CASE chain (the (s, e, id) "
    "ordering makes the 7 relations exhaustive — no converses can "
    "occur), all-BIGINT, one user_id shuffle — linear where naive "
    "Allen classification is an all-pairs join. No reference analog "
    "— extension per brief (reference sessionizes at "
    "src/etl.py-level granularity only)",
)
def j19_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("s"),
        (
            F.floor(F.unix_timestamp("ts")).cast("bigint")
            + 60 * (1 + F.col("event_id") % 10)
        )
        .cast("bigint")
        .alias("e"),
    )
    w = W.partitionBy("user_id").orderBy("s", "e", "event_id")
    lagged = iv.select(
        "user_id",
        F.lag("s").over(w).alias("ps"),
        F.lag("e").over(w).alias("pe"),
        F.col("s").alias("cs"),
        F.col("e").alias("ce"),
    )
    pairs = lagged.filter(F.col("ps").isNotNull()).select(
        "user_id",
        F.expr(_J19_REL).alias("relation"),
        F.expr(_J19_OVL).cast("bigint").alias("ovl"),
    )
    return pairs.groupBy("relation").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("ovl").cast("bigint").alias("total_overlap_sec"),
    )


# --- j20 (ext.): overlap-apportioned temporal allocation join ---------------------------

# Shared per-slice strings: the clipped overlap seconds and the
# proportional value allocation in integer micros. The allocation is
# the HALF-UP integer division (2*vm*ov + dur) div (2*dur), spelled
# subtract-modulo-divide so the same string runs on both engines (the
# quotient is < 2^53, so the final division is float-exact): a float
# ROUND here would land on exact .5 midpoints (vm*ov/dur quotients)
# that the engines round differently — the x153 midpoint trap.
_J20_OV = (
    "(LEAST(e, (h + 1) * 3600) - GREATEST(s, h * 3600))"
)
_J20_ALLOC = (
    f"CAST(((2 * vm * {_J20_OV} + (e - s))"
    f" - ((2 * vm * {_J20_OV} + (e - s)) % (2 * (e - s))))"
    f" / (2 * (e - s)) AS BIGINT)"
)


@register(
    "j20_overlap_allocation_join",
    # APPORTION, don't just match: j11 counts which intervals touch
    # which buckets; j20 SPLITS each interval's measure across the
    # hour buckets it spans, proportional to overlap seconds — the
    # time-weighted allocation every utilization/billing rollup needs
    # (a session crossing midnight bills both hours, by the fraction
    # spent in each, not double). Device: bucket-explode each session
    # to its touched hours (bounded by interval length / 3600 + 1 —
    # sessions here are <= 10 min, so <= 2 slices; NEVER a range
    # join), clip with one shared LEAST/GREATEST string, and allocate
    # micro-quantized value by exact-integer overlap ratio, rounded
    # once per slice then decimal-summed per bucket. Conservation
    # holds by construction: each interval's slices partition its
    # duration.
    oracle=f"""
    WITH iv AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + 60 * (1 + event_id % 10) AS e,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vm
      FROM events
    ),
    slices AS (
      SELECT event_type, s, e, vm,
             unnest(range(s // 3600, (e - 1) // 3600 + 1)) AS h
      FROM iv
    ),
    alloc AS (
      SELECT event_type, h,
             CAST({_J20_OV} AS BIGINT) AS ov,
             {_J20_ALLOC} AS av,
             s, e
      FROM slices
    )
    SELECT event_type, CAST(h AS BIGINT) AS hour_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_slices,
           CAST(SUM(CASE WHEN s < h * 3600 OR e > (h + 1) * 3600
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary,
           CAST(SUM(ov) AS BIGINT) AS covered_sec,
           ROUND(CAST(SUM(av) AS DOUBLE) / 1000000, 6) AS alloc_value
    FROM alloc GROUP BY event_type, h
    """,
    doc="j20 (ext.): overlap-apportioned temporal allocation — each "
    "session interval's value split across the hour buckets it spans "
    "proportional to overlap seconds (the cross-midnight billing "
    "semantics), via bounded bucket-explode + one shared clip string "
    "+ half-up integer-micro allocations (subtract-modulo-divide, no "
    "float ROUND on .5 midpoints). Completes the "
    "temporal-join family: j11 matches overlaps, j17 merges them, "
    "j18 measures gaps, j19 names relations, j20 APPORTIONS "
    "measures. Slice count is duration-bounded (<= 2 per session "
    "here), never a range join; per-bucket sums are exact. No "
    "reference analog — extension per brief",
)
def j20_overlap_allocation_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    iv = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("s"),
        (
            F.floor(F.unix_timestamp("ts")).cast("bigint")
            + 60 * (1 + F.col("event_id") % 10)
        )
        .cast("bigint")
        .alias("e"),
        F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").alias("vm"),
    )
    slices = iv.select(
        "event_type", "s", "e", "vm",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / 3600).cast("bigint"),
                F.floor((F.col("e") - 1) / 3600).cast("bigint"),
            )
        ).alias("h"),
    )
    alloc = slices.select(
        "event_type", "h", "s", "e",
        F.expr(_J20_OV).cast("bigint").alias("ov"),
        F.expr(_J20_ALLOC).alias("av"),
    )
    return alloc.groupBy(
        "event_type", F.col("h").cast("bigint").alias("hour_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_slices"),
        F.sum(
            F.when(
                (F.col("s") < F.col("h") * 3600)
                | (F.col("e") > (F.col("h") + 1) * 3600),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_boundary"),
        F.sum("ov").cast("bigint").alias("covered_sec"),
        F.expr(
            "ROUND(CAST(SUM(av) AS DOUBLE) / 1000000, 6)"
        ).alias("alloc_value"),
    )
