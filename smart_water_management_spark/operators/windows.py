"""Window-function operators (SURVEY.md §2.5 W1-W9): rolling time-series
analytics over the event stream (events.user_id ≙ sensor_id).

Reference sites: 24-row rolling stats src/spark_etl.py:109-116; range-frame
1h/6h/24h windows src/enhanced_spark_etl.py:260-278; lag/lead :281-287,
:466-468; rolling z-score anomaly flags src/spark_etl.py:127-133; trend
classification src/enhanced_spark_etl.py:303-308.

Physical shape: every window here partitions by ``user_id`` — one hash
shuffle, then sort-based window exec within partitions. All windows over
the same partition key share a single exchange (Catalyst reuses it), which
is why this module prefers stacking many measures over one window spec.
At 100 TB per-key data stays modest (sensors × time), so no skew salting
needed; a hot key would get AQE-split only for joins, windows would need
key+time-bucket two-level windowing (documented here as the scale path).

Determinism: window sums go through exact DECIMAL casts (see
functions.numeric) and every orderBy carries the unique ``event_id`` as a
tiebreaker so Spark and DuckDB agree on frame contents.

RANGE-frame semantics (SURVEY §7.3 risk 1): we order by
``cast(ts as long)`` (epoch seconds, floored) — the reference's ordering
by raw timestamp only happens to work because Spark casts internally; the
DuckDB oracle uses the same floored-seconds axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table

_DEC = "decimal(27,6)"


def _dsum_over(col, w):
    return F.sum(F.col(col).cast(_DEC)).over(w).cast("double")


# --- W1: rows-frame rolling stats (reference src/spark_etl.py:109-116:
# 24-row window per sensor).
@register(
    "w01_rows_rolling",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) / COUNT(value) OVER w AS rolling_avg,
           MIN(value) OVER w AS rolling_min,
           MAX(value) OVER w AS rolling_max,
           COUNT(*) OVER w AS rolling_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    """,
    doc="W1: 24-row rolling avg/min/max per key",
)
def w01_rows_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (_dsum_over("value", w) / F.count("value").over(w)).alias("rolling_avg"),
        F.min("value").over(w).alias("rolling_min"),
        F.max("value").over(w).alias("rolling_max"),
        F.count("*").over(w).alias("rolling_n"),
    )


# --- W2: range-frame (time-based) rolling stats over multiple horizons
# (reference src/enhanced_spark_etl.py:260-278: 1h/6h/24h windows).
@register(
    "w02_range_rolling",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w1h AS DOUBLE) AS sum_1h,
           COUNT(*) OVER w1h AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w6h AS DOUBLE) AS sum_6h,
           COUNT(*) OVER w6h AS n_6h,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w24h AS DOUBLE) AS sum_24h,
           COUNT(*) OVER w24h AS n_24h
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
    WINDOW
      w1h  AS (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
      w6h  AS (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW),
      w24h AS (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
    """,
    doc="W2: multi-horizon RANGE frames on epoch seconds",
)
def w02_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("long")
    )
    out = ev.select("event_id", "user_id", "value", "sec")
    for label, horizon in [("1h", 3600), ("6h", 21600), ("24h", 86400)]:
        w = W.partitionBy("user_id").orderBy("sec").rangeBetween(-horizon, 0)
        out = out.withColumn(f"sum_{label}", _dsum_over("value", w)).withColumn(
            f"n_{label}", F.count("*").over(w)
        )
    return out.drop("sec")


# --- W3/W4/W5: lag, lead, deltas, pct-change with zero guard
# (reference src/spark_etl.py:119-124, src/enhanced_spark_etl.py:281-287,466-468).
@register(
    "w03_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value, 1) OVER w AS prev_value,
           LAG(value, 6) OVER w AS prev_6,
           LEAD(value, 1) OVER w AS next_value,
           value - LAG(value, 1) OVER w AS delta,
           CASE WHEN LAG(value, 1) OVER w IS NOT NULL AND LAG(value, 1) OVER w <> 0
                THEN (value - LAG(value, 1) OVER w) / LAG(value, 1) OVER w * 100.0
                ELSE 0.0 END AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="W3/W4/W5: lag/lead offsets with delta and zero-guarded pct change",
)
def w03_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value", 1).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lag("value", 6).over(w).alias("prev_6"),
        F.lead("value", 1).over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta"),
        F.when(prev.isNotNull() & (prev != 0), (F.col("value") - prev) / prev * 100.0)
        .otherwise(0.0)
        .alias("pct_change"),
    )


# --- W6: rolling z-score anomaly flag (reference src/spark_etl.py:127-133,
# flag when |z| > 2.5). Mean/std from exact decimal moments over the frame.
@register(
    "w06_rolling_zscore",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(COUNT(value) OVER w AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(value*value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, value,
           CASE WHEN n > 1 AND (n*sx2 - sx*sx) / (n*(n-1.0)) > 0.0
                THEN ABS((value - sx/n) / SQRT((n*sx2 - sx*sx) / (n*(n-1.0))))
                ELSE 0.0 END AS zscore_abs,
           CASE WHEN n > 1 AND (n*sx2 - sx*sx) / (n*(n-1.0)) > 0.0
                 AND ABS((value - sx/n) / SQRT((n*sx2 - sx*sx) / (n*(n-1.0)))) > 2.5
                THEN 1 ELSE 0 END AS anomaly_flag
    FROM t
    """,
    doc="W6: rolling z-score anomaly flag from exact decimal window moments",
)
def w06_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-23, 0)
    n = F.count("value").over(w).cast("double")
    sx = F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
    sx2 = F.sum((F.col("value") * F.col("value")).cast(_DEC)).over(w).cast("double")
    var = (n * sx2 - sx * sx) / (n * (n - F.lit(1.0)))
    z = F.abs((F.col("value") - sx / n) / F.sqrt(var))
    ok = (n > 1) & (var > 0.0)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.when(ok, z).otherwise(0.0).alias("zscore_abs"),
        F.when(ok & (z > 2.5), 1).otherwise(0).alias("anomaly_flag"),
    )


# --- W7: moving-average smoothing incl. a TRUE EMA via the aggregate()
# higher-order function (the reference's "EMA" src/enhanced_spark_etl.py:290-295
# is actually another SMA; we implement the real recursion).
@register(
    "w07_sma_ema",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
               / COUNT(value) OVER w AS sma_24,
             list(value) OVER w AS vals
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, value, sma_24,
           ROUND(list_reduce(vals, (acc, x) -> acc + 0.2 * (x - acc)), 6) AS ema
    FROM t
    """,
    doc="W7: SMA + true EMA (order-dependent recursion via aggregate() HOF)",
)
def w07_sma_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-23, 0)
    vals = F.collect_list("value").over(w)
    # EMA over the trailing frame: fold left with alpha=0.2, seeded by the
    # first element — same recursion DuckDB's list_reduce applies.
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc + F.lit(0.2) * (x - acc),
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (_dsum_over("value", w) / F.count("value").over(w)).alias("sma_24"),
        F.round(ema, 6).alias("ema"),
    )


# --- W8: last-value-per-group via ranking (reference
# sql/enhanced_data_schema.sql:425-428's array_agg[1] idiom).
@register(
    "w08_latest_per_key",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="W8: latest row per key via row_number ranking",
)
def w08_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


# --- Top-K per group (SURVEY §2.6 note: reference does orderBy().limit();
# the per-group form needs ranking — rank/dense_rank/ntile surface).
@register(
    "w10_topk_per_group",
    oracle="""
    SELECT event_type, event_id, value, rn, rnk, tile
    FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn,
             RANK() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk,
             NTILE(4) OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS tile
      FROM events
    ) WHERE rn <= 3
    """,
    doc="top-k per group via row_number/rank/ntile",
)
def w10_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.ntile(4).over(w).alias("tile"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- W9: hour-of-day profile — a "window over the clock"
# (reference src/app.py:140-151).
@register(
    "w09_hourly_profile",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events
    GROUP BY hour(ts), event_type
    """,
    doc="W9: hour-of-day aggregation profile",
)
def w09_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.hour("ts").alias("hour_of_day"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("value")).alias(
            "avg_value"
        ),
    )


# --- Cumulative / running totals (engine surface: unbounded-preceding frame).
@register(
    "w11_running_total",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS running_sum,
           COUNT(*) OVER w AS running_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="running totals over an unbounded-preceding frame",
)
def w11_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        _dsum_over("value", w).alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )


# --- W12: time-series gap-fill (densification). Sensor feeds drop hours
# (the reference's staleness monitor exists precisely because of this,
# src/data_validator.py:418-429), but its dashboard charts assume a dense
# hourly axis. The scaffold is sequence+explode over the [min,max] hour
# range cross-joined with the tiny type dim — both sides are dimension-
# sized at ANY fact scale (hours × types, not rows), so the only big-table
# work is the one grouped aggregate; the scaffold join broadcasts.
@register(
    "w12_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    hours AS (
      SELECT unnest(generate_series((SELECT lo FROM bounds),
                                    (SELECT hi FROM bounds),
                                    INTERVAL 1 HOUR)) AS hr
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS hr, event_type,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(27,6))) AS s
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(h.hr, '%Y-%m-%d %H:%M:%S') AS hour,
           t.event_type,
           COALESCE(a.n, 0) AS n_events,
           CAST(COALESCE(a.s, 0) AS DOUBLE) AS sum_value
    FROM hours h
    CROSS JOIN types t
    LEFT JOIN agg a ON a.hr = h.hr AND a.event_type = t.event_type
    """,
    doc="W12: time-series gap-fill — dense hour × type scaffold via "
    "sequence+explode, zero-filled left join; missing feed hours become "
    "explicit zeros instead of silently absent chart points",
)
def w12_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(27,6)")).alias("s"),
    )
    return (
        hours.crossJoin(types)
        .join(agg, ["hr", "event_type"], "left")
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


# --- W13 (ext.): time-weighted average — the metering/SCADA aggregate for
# irregularly-sampled series, where a plain AVG over-weights bursty
# sampling. Trapezoidal integration between consecutive readings:
# TWA = Σ (v_i + v_{i-1})/2 · Δt_i / Σ Δt_i.
@register(
    "w13_time_weighted_avg",
    # Per-segment areas are doubles built from +,/,* only (bit-identical
    # across engines), cast to DECIMAL(27,6) per row so the per-group sum
    # is exact and order-independent; both orderings use floored epoch
    # seconds + event_id so frame contents agree.
    oracle="""
    WITH seg AS (
      SELECT event_type,
             sec - LAG(sec) OVER w AS dt,
             (value + LAG(value) OVER w) / 2 AS mid
      FROM (SELECT event_type, event_id, value,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      WINDOW w AS (PARTITION BY event_type ORDER BY sec, event_id)
    )
    SELECT event_type,
           COUNT(dt) AS n_segments,
           CAST(SUM(dt) AS BIGINT) AS total_seconds,
           ROUND(CAST(SUM(CAST(mid * dt AS DECIMAL(27,6))) AS DOUBLE)
                 / SUM(dt), 6) AS twa
    FROM seg GROUP BY event_type
    """,
    doc="W13: time-weighted average per event_type via trapezoidal "
    "integration over consecutive readings — lag window and final groupBy "
    "share the event_type hash-partition, so the whole plan is one "
    "shuffle + sort; at 100 TB the same shape holds per sensor key",
)
def w13_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value", F.col("ts").cast("long").alias("sec")
    )
    w = W.partitionBy("event_type").orderBy("sec", "event_id")
    seg = ev.select(
        "event_type",
        (F.col("sec") - F.lag("sec").over(w)).alias("dt"),
        ((F.col("value") + F.lag("value").over(w)) / 2).alias("mid"),
    )
    return seg.groupBy("event_type").agg(
        F.count("dt").alias("n_segments"),
        F.sum("dt").alias("total_seconds"),
        F.round(
            F.sum((F.col("mid") * F.col("dt")).cast(_DEC)).cast("double")
            / F.sum("dt"),
            6,
        ).alias("twa"),
    )


# --- W14: ntile decile banding ----------------------------------------------
# ntile assigns by row POSITION, so ties at bucket edges land by sort
# order — the ORDER BY carries event_id as a unique tiebreak or the
# banding is engine-dependent (the same rule that makes limit/offset
# pagination need a keyset, o03).
@register(
    "w14_ntile_deciles",
    oracle="""
    WITH banded AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT event_type, decile,
           COUNT(*) AS n_rows,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM banded GROUP BY event_type, decile
    """,
    doc="W14: ntile(10) decile banding per event type with a unique "
    "tiebreak (deterministic across engines), reduced to per-decile "
    "count + bounds — one window shuffle + one hash agg",
)
def w14_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type", "value", F.ntile(10).over(w).alias("decile")
        )
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


# --- W15: running distinct count via first-seen rewrite ----------------------
# COUNT(DISTINCT) OVER a running frame is unsupported (Spark) or holds
# per-frame distinct state (engines that allow it) — the scalable rewrite
# reduces each (type, user) to its FIRST day with one hash agg, rolls
# those up to daily new-key counts, and running-sums the counts with ONE
# window over days (not events): distinct-so-far becomes a plain
# cumulative sum with no distinct state proportional to history.
@register(
    "w15_running_distinct",
    oracle="""
    WITH firsts AS (
      SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY event_type, user_id
    ),
    newu AS (
      SELECT event_type, first_day AS d, COUNT(*) AS n_new_users
      FROM firsts GROUP BY event_type, first_day
    ),
    daily AS (
      SELECT e.event_type, CAST(e.ts AS DATE) AS d, COUNT(*) AS n_events
      FROM events e GROUP BY 1, 2
    )
    SELECT daily.event_type, strftime(daily.d, '%Y-%m-%d') AS day, n_events,
           COALESCE(n_new_users, 0) AS n_new_users,
           CAST(SUM(COALESCE(n_new_users, 0)) OVER (
             PARTITION BY daily.event_type ORDER BY daily.d) AS BIGINT)
             AS distinct_users_to_date
    FROM daily LEFT JOIN newu
      ON newu.event_type = daily.event_type AND newu.d = daily.d
    """,
    doc="W15: running distinct-user count per event type — COUNT(DISTINCT) "
    "OVER is rewritten as first-occurrence flags + a cumulative sum of "
    "daily new-user counts, so no per-frame distinct state exists at any "
    "scale; the day grain bounds the window input to days, not events",
)
def w15_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("d")
    )
    # first occurrence day per (type, user): one hash agg
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min("d").alias("first_day")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count("*").alias("n_events"))
    new_users = firsts.groupBy(
        "event_type", F.col("first_day").alias("d")
    ).agg(F.count("*").alias("n_new_users"))
    j = daily.join(new_users, ["event_type", "d"], "left").withColumn(
        "n_new_users", F.coalesce("n_new_users", F.lit(0))
    )
    w = W.partitionBy("event_type").orderBy("d")
    return j.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("distinct_users_to_date"),
    )


# --- W16: rank-distribution functions ----------------------------------------
# percent_rank / cume_dist complete the rank family (w10 row_number/rank,
# w14 ntile): relative standing of each reading inside its type — the
# normalized form dashboards plot as percentile curves. Same tiebreak
# rule as w14: event_id makes the ordering total, or the outputs are
# engine-dependent at duplicate values.
@register(
    "w16_rank_distributions",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS pr,
             cume_dist() OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS cd
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           ROUND(AVG(pr), 6) AS mean_percent_rank,
           ROUND(MAX(CASE WHEN pr <= 0.5 THEN value END), 6) AS median_by_pr,
           ROUND(AVG(cd), 6) AS mean_cume_dist
    FROM ranked GROUP BY event_type
    """,
    doc="W16: percent_rank + cume_dist per event type with a total "
    "ordering (event_id tiebreak), reduced to distribution summaries — "
    "one window shuffle + one hash agg",
)
def w16_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("pr"), 6).alias("mean_percent_rank"),
        F.round(F.max(F.when(F.col("pr") <= 0.5, F.col("value"))), 6).alias(
            "median_by_pr"
        ),
        F.round(F.avg("cd"), 6).alias("mean_cume_dist"),
    )


# --- W17: rolling median (robust smoothing) ---------------------------------


@register(
    "w17_rolling_median",
    oracle="""
    SELECT event_id, user_id, value,
           median(value) OVER w AS rolling_median,
           value - median(value) OVER w AS median_resid
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="W17 (ext.): 7-row rolling EXACT median per key + residual — the "
    "robust twin of w01's rolling mean (a single spike shifts a mean for "
    "its whole window but a median not at all, so residuals localize "
    "anomalies). Spark's percentile(0.5) as a window aggregate over the "
    "same single hash-partition shuffle as the other w* frames; both "
    "engines interpolate even-count medians as the midpoint of the same "
    "two doubles, so the result is engine-exact with no decimal detour",
)
def w17_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    med = F.percentile("value", F.lit(0.5)).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        med.alias("rolling_median"),
        (F.col("value") - med).alias("median_resid"),
    )


# --- W18 (ext.): session-relative event features -----------------------------
@register(
    "w18_session_relative",
    # Gaps-and-islands (t03's 30-minute rule, lag tie-broken on event_id)
    # composed with per-session windows: the per-event features a
    # behavioral model trains on. All windows share the user_id exchange.
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                          - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, event_id, session_id,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, session_id ORDER BY ts, event_id
           ) AS pos_in_session,
           CAST(FLOOR(epoch(ts)) AS BIGINT)
             - MIN(CAST(FLOOR(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id, session_id) AS secs_since_start,
           COUNT(*) OVER (PARTITION BY user_id, session_id) AS session_len
    FROM sess
    """,
    doc="W18 (ext.): per-event session-relative features — session id via "
    "gaps-and-islands (t03's 30-min rule), position within session, "
    "seconds since session start, session length. The feature block a "
    "behavioral model consumes; every window keys on user_id (the "
    "session windows refine it), so one exchange carries the whole "
    "query at any scale",
)
def w18_session_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("long") - prev_ts.cast("long")) > 1800),
        1,
    ).otherwise(0)
    wsum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(wsum)
    )
    ws = W.partitionBy("user_id", "session_id")
    wpos = ws.orderBy("ts", "event_id")
    return sess.select(
        "user_id",
        "event_id",
        "session_id",
        F.row_number().over(wpos).alias("pos_in_session"),
        (
            F.col("ts").cast("long") - F.min(F.col("ts").cast("long")).over(ws)
        ).alias("secs_since_start"),
        F.count("*").over(ws).alias("session_len"),
    )


# --- W19 (ext.): gap-fill + LINEAR INTERPOLATION — the hypertable
# `interpolate()` twin of w12's zero-fill. Missing grid hours get the
# straight line between the nearest observed hours on each side; hours
# outside the observed span stay NULL and are labeled 'edge'.
@register(
    "w19_gapfill_interpolate",
    # Exactness: hourly means are unrounded quotients of exact DECIMAL
    # sums; the interpolation is +,-,*,/ over those doubles with integer
    # hour indices, the same IEEE expression tree on both engines. The
    # grid hour is emitted as an ISO string (DATE/TIMESTAMP pandas
    # comparison pitfall).
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    hours AS (
      SELECT unnest(generate_series((SELECT lo FROM bounds),
                                    (SELECT hi FROM bounds),
                                    INTERVAL 1 HOUR)) AS hr
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS hr, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
               AS avg_v
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT CAST(epoch(h.hr) AS BIGINT) / 3600 AS idx, h.hr, t.event_type,
             a.n, a.avg_v
      FROM hours h CROSS JOIN types t
      LEFT JOIN agg a ON a.hr = h.hr AND a.event_type = t.event_type
    ),
    ctx AS (
      SELECT idx, hr, event_type, n, avg_v,
             LAST_VALUE(avg_v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             LAST_VALUE(CASE WHEN avg_v IS NOT NULL THEN idx END
                        IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pi,
             FIRST_VALUE(avg_v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN avg_v IS NOT NULL THEN idx END
                         IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ni
      FROM grid
    )
    SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           CASE WHEN n IS NOT NULL THEN avg_v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) * (CAST(idx - pi AS DOUBLE) / (ni - pi))
                ELSE NULL END AS value_filled,
           CASE WHEN n IS NOT NULL THEN 'observed'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interpolated'
                ELSE 'edge' END AS fill_kind
    FROM ctx
    """,
    doc="W19 (ext.): gap-fill with LINEAR INTERPOLATION — w12's dense "
    "hour x type scaffold, but missing hours get the straight line "
    "between the nearest observed neighbors (TimescaleDB "
    "time_bucket_gapfill + interpolate semantics) and span edges stay "
    "NULL, labeled. Neighbor lookup is last/first IGNORE NULLS over the "
    "grid — two window passes over the SAME (type, hour) ordering, one "
    "exchange; the grid is hours x types, thousands of rows per year "
    "regardless of corpus size, so the interpolation stage costs nothing "
    "even when the agg underneath scans 100 TB",
)
def w19_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count("*")
        ).alias("avg_v"),
    )
    grid = (
        hours.crossJoin(types)
        .join(agg, ["hr", "event_type"], "left")
        .withColumn(
            "idx", (F.unix_timestamp("hr") / 3600).cast("bigint")
        )
    )
    wp = (
        W.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(1, W.unboundedFollowing)
    )
    obs_idx = F.when(F.col("avg_v").isNotNull(), F.col("idx"))
    ctx = grid.select(
        "idx",
        "hr",
        "event_type",
        "n",
        "avg_v",
        F.last("avg_v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_idx, ignorenulls=True).over(wp).alias("pi"),
        F.first("avg_v", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_idx, ignorenulls=True).over(wn).alias("ni"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("idx") - F.col("pi")).cast("double")
        / (F.col("ni") - F.col("pi"))
    )
    return ctx.select(
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.when(F.col("n").isNotNull(), F.col("avg_v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value_filled"),
        F.when(F.col("n").isNotNull(), "observed")
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), "interpolated")
        .otherwise("edge")
        .alias("fill_kind"),
    )


# --- w20 (ext.): Markov transition matrix over event sequences ---------------


@register(
    "w20_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_trans,
           CAST(n_trans AS DOUBLE)
             / SUM(n_trans) OVER (PARTITION BY from_type) AS p_trans
    FROM trans
    """,
    doc="w20 (ext.): first-order Markov transition matrix over per-user "
    "event sequences — lead() within (user, time) order, then a "
    "transition-count agg and a row-normalized probability (the "
    "session-flow / funnel-discovery shape). Exactness: p_trans is the "
    "raw IEEE quotient of two exact BIGINT counts, identical in both "
    "engines, never rounded. Scale shape: the lead window shuffles once "
    "on user_id (sequences stay co-located); the transition table is "
    "|types|^2 rows regardless of corpus size, so the normalizing window "
    "costs nothing. No reference analog — extension per brief "
    "(sequential-pattern mining is absent from the reference)",
)
def w20_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    )
    trans = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_trans"))
    )
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(W.partitionBy("from_type"))
        ).alias("p_trans"),
    )


# --- w21 (ext.): CUSUM drift / change-point detection ------------------------

# Alarm when the scaled CUSUM excursion exceeds this percentage of the
# per-type value range (numerator/denominator kept integer so the
# comparison is exact decimal arithmetic in both engines).
CUSUM_PCT = 25


@register(
    "w21_cusum_drift",
    oracle=f"""
    WITH x AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value, 6) AS DECIMAL(27,6)) AS xv,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS t
      FROM events
    ),
    tot AS (
      SELECT event_type, COUNT(*) AS n, SUM(xv) AS tsum,
             MAX(xv) - MIN(xv) AS rng
      FROM x GROUP BY event_type
    ),
    pre AS (
      SELECT x.event_type, x.ts, x.t, tot.n, tot.rng,
             CAST(CAST(tot.n AS DECIMAL(10,0))
                    * CAST(SUM(x.xv) OVER (
                        PARTITION BY x.event_type ORDER BY x.t)
                      AS DECIMAL(27,6))
                  - CAST(x.t AS DECIMAL(10,0))
                    * CAST(tot.tsum AS DECIMAL(27,6))
               AS DECIMAL(27,6)) AS p
      FROM x JOIN tot USING (event_type)
    ),
    ext AS (
      -- DuckDB's LEAST/GREATEST promote DECIMAL to DOUBLE, so the
      -- clamp-at-zero is spelled as CASE to stay exact decimal
      SELECT event_type, ts, n, rng, p,
             MIN(p) OVER (PARTITION BY event_type ORDER BY t) AS mn,
             MAX(p) OVER (PARTITION BY event_type ORDER BY t) AS mx
      FROM pre
    ),
    s AS (
      SELECT event_type, ts, n,
             CAST(p - CASE WHEN mn < 0 THEN mn
                           ELSE CAST(0 AS DECIMAL(27,6)) END AS DOUBLE)
               AS s_up,
             CAST(CASE WHEN mx > 0 THEN mx
                       ELSE CAST(0 AS DECIMAL(27,6)) END - p AS DOUBLE)
               AS s_dn,
             {CUSUM_PCT / 100.0} * CAST(n AS DOUBLE) * CAST(rng AS DOUBLE)
               AS thr
      FROM ext
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN s_up > thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms_up,
           CAST(SUM(CASE WHEN s_dn > thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms_dn,
           STRFTIME(MIN(CASE WHEN s_up > thr THEN ts END),
                    '%Y-%m-%d %H:%M:%S') AS first_alarm_up_ts,
           MAX(s_up) AS max_s_up,
           MAX(s_dn) AS max_s_dn
    FROM s GROUP BY event_type
    """,
    doc="w21 (ext.): one-sided CUSUM drift detection per event_type — the "
    "classic change-point statistic S_t = P_t - min_{i<=t} P_i computed "
    "in closed window form, where P_t = n*prefix_sum(x) - t*total_sum is "
    "the n-scaled cumulative deviation from the series mean (so no "
    "division ever happens: the excursion stays exact DECIMAL). An alarm "
    f"fires when the excursion exceeds {CUSUM_PCT}% of n*range; the "
    "exact decimal excursion and threshold are each cast to DOUBLE once "
    "(deterministic round-to-nearest in both engines) so the comparison "
    "is on bit-identical doubles without widening decimals past 38 "
    "digits. Both drift directions are tracked (s_up via running min of "
    "P, s_dn via running max). Exactness: per-row values quantized to "
    "DECIMAL(27,6); prefix sums, running extrema and the scaled products "
    "are exact decimal ops re-capped to DECIMAL(27,6) (magnitude ≤ "
    "n²·max|x| ≈ 1e15 at sf1, well inside the 21 integer digits); the "
    "reported maxima are those same doubles, never rounded. Scale "
    "shape: one shuffle on event_type for the ordered windows (sequences "
    "co-located, same layout reused by all three window passes), then a "
    "per-type agg — the monitoring pass a sensor fleet runs per metric. "
    "Reference analog: anomaly_flag drift scans in "
    "src/enhanced_spark_etl.py:411-460 done there with per-batch pandas "
    "means",
)
def w21_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        "ts",
        F.round("value", 6).cast("decimal(27,6)").alias("xv"),
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("t"),
    )
    tot = x.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("xv").alias("tsum"),
        (F.max("xv") - F.min("xv")).alias("rng"),
    )
    wo = W.partitionBy("event_type").orderBy("t")
    p = (
        F.col("n").cast("decimal(10,0)")
        * F.sum("xv").over(wo).cast("decimal(27,6)")
        - F.col("t").cast("decimal(10,0)") * F.col("tsum").cast("decimal(27,6)")
    ).cast("decimal(27,6)")
    pre = x.join(F.broadcast(tot), "event_type").select(
        "event_type", "ts", "t", "n", "rng", p.alias("p")
    )
    s = pre.select(
        "event_type",
        "ts",
        (F.col("p") - F.least(F.min("p").over(wo), F.lit(0)))
        .cast("double")
        .alias("s_up"),
        (F.greatest(F.max("p").over(wo), F.lit(0)) - F.col("p"))
        .cast("double")
        .alias("s_dn"),
        (
            F.lit(CUSUM_PCT / 100.0)
            * F.col("n").cast("double")
            * F.col("rng").cast("double")
        ).alias("thr"),
        "n",
    )
    up = F.col("s_up") > F.col("thr")
    dn = F.col("s_dn") > F.col("thr")
    return s.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_points"),
        F.sum(up.cast("int")).cast("bigint").alias("n_alarms_up"),
        F.sum(dn.cast("int")).cast("bigint").alias("n_alarms_dn"),
        F.date_format(
            F.min(F.when(up, F.col("ts"))), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_alarm_up_ts"),
        F.max("s_up").alias("max_s_up"),
        F.max("s_dn").alias("max_s_dn"),
    )


# --- w22 (ext.): half-life time-decayed mean ---------------------------------

W22_HALF_LIFE_H = 24


@register(
    "w22_time_decay_mean",
    oracle=f"""
    WITH x AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(ROUND(value, 6) AS DECIMAL(27,6)) AS xv
      FROM events
    ),
    t AS (SELECT event_type, MAX(us) AS t_now FROM x GROUP BY event_type),
    wtd AS (
      SELECT x.event_type, x.xv,
             CAST(ROUND(POWER(0.5,
               CAST((t.t_now - x.us) // 3600000000 AS DOUBLE)
                 / {W22_HALF_LIFE_H}.0), 6) AS DECIMAL(7,6)) AS w
      FROM x JOIN t USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w * xv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
             AS decayed_mean,
           CAST(SUM(xv) AS DOUBLE) / COUNT(*) AS plain_mean,
           (CAST(SUM(w * xv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE))
             / (CAST(SUM(xv) AS DOUBLE) / COUNT(*)) AS recency_ratio
    FROM wtd GROUP BY event_type
    """,
    doc=f"w22 (ext.): half-life time-decayed mean per event_type — each "
    f"observation weighted 2^(-age_hours/{W22_HALF_LIFE_H}) relative to "
    "the key's newest event (the freshness-weighted leaderboard / "
    "decayed-counter primitive; recency_ratio > 1 means the metric is "
    "trending up). Unlike w07's row-ordered EMA this is an unordered "
    "AGGREGATE — no sequential dependency, so it map-side combines. "
    "Exactness: ages are exact integer hours from exact epoch-micro "
    "arithmetic; each weight goes through POWER(0.5, h/24) rounded to "
    "6dp (absorbing libm ulp skew) then DECIMAL(7,6); weighted sums "
    "are exact decimal products summed as DECIMAL; the three reported "
    "ratios are IEEE quotients of identical doubles. Scale shape: two "
    "map-combined aggs over the event stream (per-type max, then the "
    "weighted sums) with the 5-row max table broadcast between them — "
    "no window, no shuffle of raw events beyond the agg combine. "
    "Reference analog: dashboard freshness weighting in src/app.py",
)
def w22_time_decay_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.round("value", 6).cast("decimal(27,6)").alias("xv"),
    )
    t = x.groupBy("event_type").agg(F.max("us").alias("t_now"))
    wtd = x.join(F.broadcast(t), "event_type").select(
        "event_type",
        "xv",
        F.round(
            F.pow(
                F.lit(0.5),
                F.expr("CAST((t_now - us) DIV 3600000000 AS DOUBLE)")
                / W22_HALF_LIFE_H,
            ),
            6,
        )
        .cast("decimal(7,6)")
        .alias("w"),
    )
    dm = F.sum(F.col("w") * F.col("xv")).cast("double") / F.sum("w").cast(
        "double"
    )
    pm = F.sum("xv").cast("double") / F.count("*")
    return wtd.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        dm.alias("decayed_mean"),
        pm.alias("plain_mean"),
        (dm / pm).alias("recency_ratio"),
    )


# --- w23 (ext.): seasonal-naive residual outliers -----------------------------

_W23_SEASON = 168  # hours: same clock hour one week earlier
_W23_TOPK = 3


@register(
    "w23_seasonal_naive_outliers",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             SUM(CAST(value AS DECIMAL(27,6))) AS hv
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT c.event_type, c.h, c.hv AS actual, p.hv AS baseline,
             c.hv - p.hv AS resid
      FROM hourly c
      JOIN hourly p ON p.event_type = c.event_type
                   AND p.h = c.h - {_W23_SEASON}
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY ABS(resid) DESC, h) AS rk
      FROM j
    )
    SELECT event_type, h, rk,
           CAST(actual AS DOUBLE) AS actual,
           CAST(baseline AS DOUBLE) AS baseline,
           CAST(resid AS DOUBLE) AS residual
    FROM r WHERE rk <= {_W23_TOPK}
    """,
    doc=f"w23 (ext.): seasonal-naive anomaly screen — each observed "
    f"hour's total demand vs the same clock hour {_W23_SEASON}h (one "
    f"week) earlier, top-{_W23_TOPK} absolute residuals per event type. "
    "The fastest-possible seasonal baseline (no model fit), the screen "
    "an ops dashboard runs before paging on a demand spike. Exactness: "
    "hourly totals, baselines and residuals are all DECIMAL (exact "
    "subtraction — ranking never compares drifting doubles); doubles "
    "appear only in the final casts. Scale: the self-join and ranking "
    "run on the calendar-bounded hourly pre-agg (types x hours), one "
    "equi-join co-partitioned with the window's hash on event_type",
)
def w23_seasonal_naive_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir)
    cur = hourly.select(
        "event_type", "h", F.col("hv").alias("actual")
    )
    prev = hourly.select(
        "event_type",
        (F.col("h") + _W23_SEASON).alias("h"),
        F.col("hv").alias("baseline"),
    )
    j = cur.join(prev, ["event_type", "h"]).withColumn(
        "resid", F.col("actual") - F.col("baseline")
    )
    w = W.partitionBy("event_type").orderBy(
        F.abs(F.col("resid")).desc(), F.col("h").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _W23_TOPK)
        .select(
            "event_type",
            "h",
            "rk",
            F.col("actual").cast("double").alias("actual"),
            F.col("baseline").cast("double").alias("baseline"),
            F.col("resid").cast("double").alias("residual"),
        )
    )


# --- w24 (ext.): consecutive-day activity streaks ------------------------------


@register(
    "w24_activity_streaks",
    # Gaps-and-islands via the date-minus-rank device: per user, rank
    # the DISTINCT active days; day - rank(day) is constant within a
    # consecutive run, so grouping by it yields the streaks — one
    # distinct pre-agg, one partitioned rank window, one hash agg:
    # no self-join, no recursion. All values are integers (epoch days).
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS d
      FROM events
    ),
    runs AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len
      FROM runs GROUP BY 1, 2
    )
    SELECT CAST(len AS BIGINT) AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM streaks GROUP BY len
    """,
    doc="w24 (ext.): consecutive-day activity streaks per user (sensor "
    "uptime runs), via the date-minus-rank gaps-and-islands device — "
    "distinct active days, one user-partitioned rank window, then "
    "day - rank is constant exactly within a consecutive run; reduced "
    "to the streak-length histogram. The uptime/engagement metric "
    "every monitoring dashboard wants, with no self-join and no "
    "recursion; complements t09's event-level run lengths at day "
    "grain. Integer-exact throughout",
)
def w24_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400.0).cast("bigint").alias("d"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    runs = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = runs.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy(F.col("len").cast("bigint").alias("streak_days")).agg(
        F.count("*").cast("bigint").alias("n_streaks"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --- w25 (ext.): EWMA control chart ------------------------------------------

_W25_ALPHA = 0.2
_W25_L = 3.0
# Embedded as repr() so both engines parse the IDENTICAL double: the
# smoothing complement squared and the variance-inflation ratio.
_W25_C2 = repr((1 - _W25_ALPHA) ** 2)          # (1-a)^2
_W25_RATIO = repr(_W25_ALPHA / (2 - _W25_ALPHA))  # a/(2-a)


@register(
    "w25_ewma_control",
    # The EWMA control chart (Roberts 1959): s_t = a*x_t + (1-a)*s_{t-1}
    # seeded at the series mean, with time-varying control limits
    # mu ± L*sigma*sqrt(a/(2-a)*(1-(1-a)^(2t))). Sequential state, so
    # the m15 fold device again: a 3-wide accumulator [s, (1-a)^(2t),
    # violations] folds the h-ordered series identically in both
    # engines; mu/sigma come from exact decimal moments. Detects
    # small sustained shifts that w21's CUSUM and a 3-sigma Shewhart
    # rule trade off differently.
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS hv
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             list(hv ORDER BY h) AS xs,
             COUNT(*) AS n_hours,
             (CAST(SUM(CAST(hv AS DECIMAL(27,6))) AS DOUBLE) / COUNT(hv))
               AS mu,
             CASE WHEN COUNT(hv) > 1 THEN SQRT(GREATEST(
               (CAST(COUNT(hv) AS DOUBLE)
                  * CAST(SUM(CAST(hv*hv AS DECIMAL(27,6))) AS DOUBLE)
                - CAST(SUM(CAST(hv AS DECIMAL(27,6))) AS DOUBLE)
                  * CAST(SUM(CAST(hv AS DECIMAL(27,6))) AS DOUBLE))
               / (CAST(COUNT(hv) AS DOUBLE)
                  * (CAST(COUNT(hv) AS DOUBLE) - 1.0)), 0.0)) END AS sigma
      FROM hourly GROUP BY event_type
    ),
    fold AS (
      SELECT event_type, n_hours, mu, sigma,
             list_reduce(
               list_prepend([mu, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                            list_transform(xs, e -> [e])),
               (acc, x) ->
                 [{_W25_ALPHA} * x[1] + {1 - _W25_ALPHA} * acc[1],
                  acc[2] * CAST({_W25_C2} AS DOUBLE),
                  acc[3] + (CASE WHEN
                    ABS(({_W25_ALPHA} * x[1] + {1 - _W25_ALPHA} * acc[1])
                        - mu)
                    > {_W25_L} * sigma
                      * SQRT(CAST({_W25_RATIO} AS DOUBLE)
                             * (1 - acc[2] * CAST({_W25_C2} AS DOUBLE)))
                    THEN 1.0 ELSE 0.0 END)]) AS st
      FROM ser WHERE n_hours >= 2
    )
    SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours, mu, sigma,
           st[1] AS ewma_final,
           CAST(st[3] AS BIGINT) AS n_violations,
           mu + {_W25_L} * sigma
             * SQRT(CAST({_W25_RATIO} AS DOUBLE) * (1 - st[2])) AS ucl_final
    FROM fold
    """,
    doc=f"w25 (ext.): EWMA control chart (alpha={_W25_ALPHA}, "
    f"L={_W25_L}) over the hourly demand series per event type — "
    "final smoothed state, the count of points outside the "
    "time-varying control limits, and the final upper limit. The "
    "small-shift drift monitor between w21's CUSUM (cumulative "
    "evidence) and plain z-score thresholds (memoryless): EWMA "
    "weights recent evidence geometrically. Engine-exact via the "
    "fold device (3-wide accumulator carries the EWMA, the "
    "(1-a)^(2t) limit term, and the violation count); mu/sigma are "
    "decimal-moment exact. Scale: one map-combined hourly pre-agg, "
    "then O(period) fold state per key",
)
def w25_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import davg, dstddev
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir).select(
        "event_type", "h", F.col("hv").cast("double").alias("hv")
    )
    ser = (
        hourly.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("h", "hv"))),
                lambda s: s["hv"],
            ).alias("xs"),
            F.count("*").cast("bigint").alias("n_hours"),
            davg("hv").alias("mu"),
            dstddev("hv").alias("sigma"),
        )
        .filter(F.col("n_hours") >= 2)
    )
    a, L = _W25_ALPHA, _W25_L
    c2 = F.lit(float(_W25_C2))
    ratio = F.lit(float(_W25_RATIO))
    mu, sigma = F.col("mu"), F.col("sigma")

    def step(acc, x):
        s_new = a * x + (1 - a) * acc[0]
        p_new = acc[1] * c2
        limit = L * sigma * F.sqrt(ratio * (1 - p_new))
        return F.array(
            s_new,
            p_new,
            acc[2]
            + F.when(F.abs(s_new - mu) > limit, F.lit(1.0)).otherwise(0.0),
        )

    st = F.aggregate(
        F.col("xs"), F.array(mu, F.lit(1.0), F.lit(0.0)), step
    )
    return ser.select(
        "event_type",
        "n_hours",
        "mu",
        "sigma",
        st[0].alias("ewma_final"),
        st[2].cast("bigint").alias("n_violations"),
        (mu + L * sigma * F.sqrt(ratio * (1 - st[1]))).alias("ucl_final"),
    )


# --- w26 (ext.): rolling skewness / kurtosis -------------------------------------


@register(
    "w26_rolling_higher_moments",
    # Rolling 24h third/fourth standardized moments per event type. The
    # x^3/x^4 magnitudes break the decimal-sum device (at ~1e9 a
    # double's ulp rivals the 6-dp quantum, so double->decimal rounding
    # is no longer engine-stable) — so this uses a ROLLING FOLD
    # instead: the per-type series is collected once (calendar-bounded)
    # and every row's 24-slice folds [n, s1, s2, s3, s4] left-to-right
    # in h order, identically in both engines. Zero rounding anywhere.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             list(x ORDER BY h) AS xs,
             list(h ORDER BY h) AS hs
      FROM hourly GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             unnest(list_transform(range(1, len(xs) + 1), t -> {
               'h': hs[t],
               'm': list_reduce(
                 list_prepend([CAST(0 AS DOUBLE), 0, 0, 0, 0],
                   list_transform(xs[greatest(t - 23, 1):t], v -> [v])),
                 (a, x) -> [a[1] + 1, a[2] + x[1], a[3] + x[1] * x[1],
                            a[4] + (x[1] * x[1]) * x[1],
                            a[5] + (x[1] * x[1]) * (x[1] * x[1])])
             })) AS r
      FROM ser
    ),
    m AS (
      SELECT event_type, r.h AS h, r.m[1] AS n24,
             r.m[2] / r.m[1] AS mu,
             r.m[3] / r.m[1] - (r.m[2] / r.m[1]) * (r.m[2] / r.m[1]) AS m2,
             r.m[4] / r.m[1] - 3 * (r.m[2] / r.m[1]) * (r.m[3] / r.m[1])
               + 2 * (r.m[2] / r.m[1]) * (r.m[2] / r.m[1])
                   * (r.m[2] / r.m[1]) AS m3,
             r.m[5] / r.m[1] - 4 * (r.m[2] / r.m[1]) * (r.m[4] / r.m[1])
               + 6 * (r.m[2] / r.m[1]) * (r.m[2] / r.m[1])
                   * (r.m[3] / r.m[1])
               - 3 * (r.m[2] / r.m[1]) * (r.m[2] / r.m[1])
                   * (r.m[2] / r.m[1]) * (r.m[2] / r.m[1]) AS m4
      FROM ex
    )
    SELECT event_type, CAST(h AS BIGINT) AS h,
           CAST(n24 AS BIGINT) AS n24, mu,
           CASE WHEN m2 > 0 THEN m3 / (m2 * SQRT(m2)) END AS skew_24h,
           CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 END AS kurt_24h
    FROM m
    """,
    doc="w26 (ext.): rolling 24h skewness and excess kurtosis of the "
    "hourly demand per event type — the distribution-SHAPE monitors "
    "(w02/w06 track location/scale; heavy tails and asymmetry move "
    "first in fraud/burst regimes). Exactness device: a ROLLING FOLD "
    "— every row's 24-slice of the h-ordered series folds "
    "[n, s1..s4] in identical order in both engines (the decimal-sum "
    "device is unusable here: x^4 magnitudes push double ulp past "
    "the 6-dp quantum). Scale: the fold runs in-row over the "
    "calendar-bounded per-type series (<=8,760 rows/year/type "
    "regardless of corpus size) after ONE map-combined hourly "
    "pre-agg; O(24) work per output row, no window exchange at all",
)
def w26_rolling_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir).select(
        "event_type", "h", F.col("hv").cast("double").alias("x")
    )
    ser = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "x"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "x"))),
            lambda s: s["h"],
        ).alias("hs"),
    )
    init = F.array(*[F.lit(0.0)] * 5)

    def merge(a, v):
        return F.array(
            a[0] + 1,
            a[1] + v,
            a[2] + v * v,
            a[3] + (v * v) * v,
            a[4] + (v * v) * (v * v),
        )

    def row_for(t):
        sl = F.slice(
            F.col("xs"),
            F.greatest(t - 23, F.lit(1)),
            F.least(t, F.lit(24)),
        )
        return F.struct(
            F.element_at("hs", t).alias("h"),
            F.aggregate(sl, init, merge).alias("m"),
        )

    ex = ser.select(
        "event_type",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("xs")), lambda t: row_for(t)
            )
        ).alias("r"),
    )
    m = F.col("r.m")
    n = m[0]
    mu = m[1] / n
    m2 = m[2] / n - mu * mu
    m3 = m[3] / n - 3 * mu * (m[2] / n) + 2 * mu * mu * mu
    m4 = (
        m[4] / n
        - 4 * mu * (m[3] / n)
        + 6 * mu * mu * (m[2] / n)
        - 3 * mu * mu * mu * mu
    )
    return ex.select(
        "event_type",
        F.col("r.h").cast("bigint").alias("h"),
        n.cast("bigint").alias("n24"),
        mu.alias("mu"),
        F.when(m2 > 0, m3 / (m2 * F.sqrt(m2))).alias("skew_24h"),
        F.when(m2 > 0, m4 / (m2 * m2) - 3).alias("kurt_24h"),
    )


# --- w27 (ext.): inter-event gap distribution --------------------------------------


@register(
    "w27_interevent_gap_distribution",
    # Per-user inter-event gaps (lag over the user timeline), summarized
    # per event type with exact interpolated quantiles — the arrival-
    # process profile that sizes t03/t06's session timeout: the p75/p90
    # gap IS the evidence for a 30-minute session gap, not a guess.
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           quantile_cont(CAST(gap_s AS DOUBLE), 0.5) AS p50_gap_s,
           quantile_cont(CAST(gap_s AS DOUBLE), 0.75) AS p75_gap_s,
           quantile_cont(CAST(gap_s AS DOUBLE), 0.9) AS p90_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
    doc="w27 (ext.): inter-event gap distribution — per event type, the "
    "exact p50/p75/p90 of the seconds since the same user's previous "
    "event (any type), plus the max. The arrival-process evidence "
    "behind session-timeout choices (t03/t06) and staleness bounds "
    "(t04): pick the timeout ABOVE the p90 within-session gap. Scale: "
    "one lag window partitioned by user over the fact scan (the same "
    "exchange w18's session-relative numbers use), then a grouped "
    "exact percentile on the tiny type domain. Exactness: integer "
    "epoch gaps; F.percentile ≙ quantile_cont",
)
def w27_interevent_gap_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp("ts").cast("bigint")
    gap = s - F.lag(s).over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    gaps = ev.select("event_type", gap.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    gd = F.col("gap_s").cast("double")
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").cast("bigint").alias("n_gaps"),
        F.percentile(gd, 0.5).alias("p50_gap_s"),
        F.percentile(gd, 0.75).alias("p75_gap_s"),
        F.percentile(gd, 0.9).alias("p90_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
    )


# --- w29 (ext.): rolling cross-correlation between series --------------------------

_W29_PAIRS = [("click", "view"), ("view", "purchase")]


@register(
    "w29_rolling_cross_correlation",
    # Rolling 24h Pearson correlation BETWEEN two event types' hourly
    # series (co-movement monitor): the series join on the hour grid,
    # one set of shared windows produces all five rolling moments, and
    # the correlation is closed-form on exact decimal window sums —
    # the w06 device applied to a PAIR of series.
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      {" UNION ALL ".join(
        f'''SELECT '{a}' AS series_a, '{b}' AS series_b, a.h,
             a.x AS xa, b.x AS xb
      FROM (SELECT h, x FROM hourly WHERE event_type = '{a}') a
      JOIN (SELECT h, x FROM hourly WHERE event_type = '{b}') b
        ON b.h = a.h'''
        for a, b in _W29_PAIRS)}
    ),
    m AS (
      SELECT series_a, series_b, h,
             COUNT(*) OVER win AS n24,
             CAST(SUM(CAST(xa AS DECIMAL(27,6))) OVER win AS DOUBLE) AS sa,
             CAST(SUM(CAST(xb AS DECIMAL(27,6))) OVER win AS DOUBLE) AS sb,
             CAST(SUM(CAST(xa*xa AS DECIMAL(27,6))) OVER win AS DOUBLE)
               AS saa,
             CAST(SUM(CAST(xb*xb AS DECIMAL(27,6))) OVER win AS DOUBLE)
               AS sbb,
             CAST(SUM(CAST(xa*xb AS DECIMAL(27,6))) OVER win AS DOUBLE)
               AS sab
      FROM paired
      WINDOW win AS (PARTITION BY series_a, series_b ORDER BY h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT series_a, series_b, CAST(h AS BIGINT) AS h,
           CAST(n24 AS BIGINT) AS n24,
           CASE WHEN n24 > 1
                 AND (n24*saa - sa*sa) > 0 AND (n24*sbb - sb*sb) > 0
                THEN (n24*sab - sa*sb)
                     / (SQRT(n24*saa - sa*sa) * SQRT(n24*sbb - sb*sb))
           END AS corr_24h
    FROM m
    """,
    doc="w29 (ext.): rolling 24h cross-correlation between event-type "
    "pairs' hourly series — the co-movement monitor (decoupling of "
    "normally-correlated streams is an incident signal uni-series "
    "monitors like w21/w25 can't see). Scale: the two series join on "
    "the calendar-bounded hour grid; ONE window frame yields all five "
    "rolling moments; correlation is closed-form on exact decimal "
    "window sums (w06 device, paired). Exactness: decimal window "
    "sums, single IEEE expression, NULL-guarded degenerate windows",
)
def w29_rolling_cross_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir).select(
        "event_type", "h", F.col("hv").cast("double").alias("x")
    )
    out = None
    for a, b in _W29_PAIRS:
        sa = hourly.filter(F.col("event_type") == a).select(
            "h", F.col("x").alias("xa")
        )
        sb = hourly.filter(F.col("event_type") == b).select(
            "h", F.col("x").alias("xb")
        )
        pair = sa.join(sb, "h").select(
            F.lit(a).alias("series_a"),
            F.lit(b).alias("series_b"),
            "h",
            "xa",
            "xb",
        )
        out = pair if out is None else out.unionByName(pair)
    win = (
        W.partitionBy("series_a", "series_b")
        .orderBy("h")
        .rowsBetween(-23, 0)
    )
    dec = "decimal(27,6)"
    xa, xb = F.col("xa"), F.col("xb")
    m = out.select(
        "series_a",
        "series_b",
        "h",
        F.count("*").over(win).alias("n24"),
        F.sum(xa.cast(dec)).over(win).cast("double").alias("sa"),
        F.sum(xb.cast(dec)).over(win).cast("double").alias("sb"),
        F.sum((xa * xa).cast(dec)).over(win).cast("double").alias("saa"),
        F.sum((xb * xb).cast(dec)).over(win).cast("double").alias("sbb"),
        F.sum((xa * xb).cast(dec)).over(win).cast("double").alias("sab"),
    )
    n = F.col("n24").cast("double")
    va = n * F.col("saa") - F.col("sa") * F.col("sa")
    vb = n * F.col("sbb") - F.col("sb") * F.col("sb")
    return m.select(
        "series_a",
        "series_b",
        F.col("h").cast("bigint").alias("h"),
        F.col("n24").cast("bigint").alias("n24"),
        F.when(
            (F.col("n24") > 1) & (va > 0) & (vb > 0),
            (n * F.col("sab") - F.col("sa") * F.col("sb"))
            / (F.sqrt(va) * F.sqrt(vb)),
        ).alias("corr_24h"),
    )


# --- w30 (ext.): rolling 24h order-statistic quantiles ------------------------------


@register(
    "w30_rolling_window_quantiles",
    # Rolling 24h p25/p50/p75/p90 per event type as EXACT order
    # statistics: each row's 24-slice of the h-ordered hourly series is
    # sorted in-row and indexed at ceil(n*q) — pure SELECTION, zero
    # float arithmetic except the final IQR subtraction of two
    # identical doubles, so both engines agree bit-for-bit with no
    # rounding device at all (the selection analog of w26's rolling
    # fold).
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             list(x ORDER BY h) AS xs,
             list(h ORDER BY h) AS hs
      FROM hourly GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             unnest(list_transform(range(1, len(xs) + 1), t -> {
               'h': hs[t],
               's': list_sort(xs[greatest(t - 23, 1):t])
             })) AS r
      FROM ser
    )
    SELECT event_type, CAST(r.h AS BIGINT) AS h,
           CAST(len(r.s) AS BIGINT) AS win_n,
           r.s[CAST(CEIL(len(r.s) * 0.25) AS INT)] AS p25,
           r.s[CAST(CEIL(len(r.s) * 0.5) AS INT)] AS p50,
           r.s[CAST(CEIL(len(r.s) * 0.75) AS INT)] AS p75,
           r.s[CAST(CEIL(len(r.s) * 0.9) AS INT)] AS p90,
           r.s[CAST(CEIL(len(r.s) * 0.75) AS INT)]
             - r.s[CAST(CEIL(len(r.s) * 0.25) AS INT)] AS iqr
    FROM ex
    """,
    doc="w30 (ext.): rolling 24h exact quantiles (p25/p50/p75/p90 + "
    "IQR) of the hourly demand per event type — the robust-scale "
    "band behind w06's z-scores (mean/std break under bursts; the "
    "rolling IQR doesn't), and the exact twin of what a production "
    "monitor approximates with sketches. Exactness device: in-row "
    "SORT + ceil(n*q) indexing of each row's 24-slice — pure "
    "selection, so there is nothing to round and both engines agree "
    "bit-for-bit. Scale: the per-type series is calendar-bounded "
    "(8,760 rows/year/type) after ONE map-combined hourly pre-agg; "
    "each output row does O(24 log 24) in-row work; no window "
    "exchange. At raw-event grain the same monitor would ride the "
    "a29 mergeable quantile sketch instead",
)
def w30_rolling_window_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir).select(
        "event_type", "h", F.col("hv").cast("double").alias("x")
    )
    ser = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "x"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "x"))),
            lambda s: s["h"],
        ).alias("hs"),
    )

    def row_for(t):
        sl = F.slice(
            F.col("xs"),
            F.greatest(t - 23, F.lit(1)),
            F.least(t, F.lit(24)),
        )
        return F.struct(
            F.element_at("hs", t).alias("h"),
            F.array_sort(sl).alias("s"),
        )

    ex = ser.select(
        "event_type",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("xs")), lambda t: row_for(t)
            )
        ).alias("r"),
    )
    s = F.col("r.s")
    n = F.size(s)

    def q_at(q):
        return F.element_at(
            s, F.ceil(n * F.lit(q)).cast("int")
        )

    return ex.select(
        "event_type",
        F.col("r.h").cast("bigint").alias("h"),
        n.cast("bigint").alias("win_n"),
        q_at(0.25).alias("p25"),
        q_at(0.5).alias("p50"),
        q_at(0.75).alias("p75"),
        q_at(0.9).alias("p90"),
        (q_at(0.75) - q_at(0.25)).alias("iqr"),
    )


# --- w31 (ext.): SAX symbolization + motif discovery --------------------------------

_W31_BP = 0.675  # ~N(0,1) quartile breakpoints for a 4-symbol alphabet


@register(
    "w31_sax_motifs",
    # Symbolic Aggregate approXimation of each type's hourly series: z-
    # normalize (decimal moments -> identical doubles), map each hour to
    # one of 4 symbols at the +-0.675 / 0 breakpoints, concatenate in h
    # order, and surface the most frequent 4-symbol motif — the
    # discretization time-series mining (motif/novelty search) is built
    # on. Breakpoint constants are injected as CAST('<repr>' AS DOUBLE)
    # strings (the a43 DuckDB DECIMAL-literal trap).
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x * x AS DECIMAL(27,6))) AS DOUBLE) AS s2
      FROM hourly GROUP BY event_type
    ),
    sym AS (
      SELECT h.event_type, h.h,
             CASE
               WHEN (h.x - m.s1 / m.n)
                    / SQRT((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
                    < CAST('{-_W31_BP!r}' AS DOUBLE) THEN 'a'
               WHEN (h.x - m.s1 / m.n)
                    / SQRT((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
                    < CAST('0' AS DOUBLE) THEN 'b'
               WHEN (h.x - m.s1 / m.n)
                    / SQRT((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
                    < CAST('{_W31_BP!r}' AS DOUBLE) THEN 'c'
               ELSE 'd' END AS s
      FROM hourly h JOIN mom m USING (event_type)
    ),
    sax AS (
      SELECT event_type, string_agg(s, '' ORDER BY h) AS sax_str
      FROM sym GROUP BY event_type
    ),
    grams AS (
      SELECT event_type,
             unnest(list_transform(range(1, len(sax_str) - 2),
                                   i -> substr(sax_str, CAST(i AS INT), 4)))
               AS motif
      FROM sax
    ),
    counts AS (
      SELECT event_type, motif, COUNT(*) AS c
      FROM grams GROUP BY event_type, motif
    ),
    best AS (
      SELECT event_type, motif, c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY c DESC, motif) AS rk
      FROM counts
    )
    SELECT s.event_type,
           CAST(len(s.sax_str) AS BIGINT) AS n_hours,
           b.motif AS top_motif,
           CAST(b.c AS BIGINT) AS top_motif_count
    FROM sax s JOIN best b
      ON b.event_type = s.event_type AND b.rk = 1
    """,
    doc="w31 (ext.): SAX symbolization + motif discovery — each type's "
    "hourly series z-normalized (decimal moments) and discretized to "
    "a 4-symbol alphabet at the N(0,1) quartile breakpoints, then "
    "the most frequent 4-symbol motif surfaced (ties to the "
    "lexicographically first) — the symbolic discretization under "
    "motif mining, anomaly grammars, and series indexing; w20's "
    "Markov transitions read THIS alphabet one level up. Scale: "
    "moments and symbols ride the calendar-bounded hourly grid; the "
    "motif fanout is len-3 substrings per type (in-row transform), "
    "counted by one word-count aggregate. Exactness: decimal "
    "moments, string-cast breakpoint constants (the DuckDB "
    "DECIMAL-literal ulp trap), integer counts, deterministic ties",
)
def w31_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir).select(
        "event_type", "h", F.col("hv").cast("double").alias("x")
    )
    xdec = F.col("x").cast("decimal(27,6)")
    mom = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xdec).cast("double").alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(27,6)"))
        .cast("double")
        .alias("s2"),
    )
    z = (F.col("x") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    sym = hourly.join(mom, "event_type").select(
        "event_type",
        "h",
        F.when(z < -_W31_BP, "a")
        .when(z < 0.0, "b")
        .when(z < _W31_BP, "c")
        .otherwise("d")
        .alias("s"),
    )
    sax = sym.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("h", "s"))),
                lambda r: r["s"],
            ),
            "",
        ).alias("sax_str")
    )
    grams = sax.select(
        "event_type",
        "sax_str",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("sax_str") - 3),
                lambda i: F.col("sax_str").substr(i, F.lit(4)),
            )
        ).alias("motif"),
    )
    counts = grams.groupBy("event_type", "motif").agg(
        F.count("*").alias("c")
    )
    wb = W.partitionBy("event_type").orderBy(
        F.desc("c"), F.asc("motif")
    )
    best = (
        counts.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("motif").alias("top_motif"), "c")
    )
    return sax.join(best, "event_type").select(
        "event_type",
        F.length("sax_str").cast("bigint").alias("n_hours"),
        "top_motif",
        F.col("c").cast("bigint").alias("top_motif_count"),
    )


# --- w32 (ext.): Hampel outlier filter (rolling median + MAD) -----------------------

_W32_MIN_WIN = 12          # evaluate once 12 trailing hours exist
_W32_K = "4.4478"          # 3 * 1.4826 (MAD-to-sigma), a43 literal device


@register(
    "w32_hampel_filter",
    # The robust outlier rule: flag x_t when |x_t - median(W)| exceeds
    # k * MAD(W) over the 24 TRAILING hours W (causal window, t
    # excluded). Median and MAD are exact order statistics — in-row
    # sort + ceil(n/2) selection (w30's device), MAD via a second
    # selection over the absolute deviations — so the only arithmetic
    # is |x - med| and k * mad, identical IEEE expressions both sides.
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             list(x ORDER BY h) AS xs,
             list(h ORDER BY h) AS hs
      FROM hourly GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             unnest(list_transform(
               range({_W32_MIN_WIN} + 1, len(xs) + 1), t -> {{
                 'h': hs[t],
                 'x': xs[t],
                 'w': list_sort(xs[greatest(t - 24, 1):t - 1])
               }})) AS r
      FROM ser
    ),
    med AS (
      SELECT event_type, r.h AS h, r.x AS x, r.w AS w,
             r.w[CAST(CEIL(len(r.w) / 2.0) AS INT)] AS med
      FROM ex
    ),
    mad AS (
      SELECT event_type, h, x, med,
             list_sort(list_transform(w, v -> ABS(v - med)))
               [CAST(CEIL(len(w) / 2.0) AS INT)] AS mad
      FROM med
    ),
    flags AS (
      SELECT event_type, h,
             CASE WHEN ABS(x - med) > CAST('{_W32_K}' AS DOUBLE) * mad
                  THEN 1 ELSE 0 END AS flagged
      FROM mad
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           CAST(MAX(CASE WHEN flagged = 1 THEN h END) AS BIGINT)
             AS last_flagged_hour
    FROM flags GROUP BY event_type
    """,
    doc=f"w32 (ext.): Hampel identifier per event type — flag hours "
    f"whose demand sits more than {_W32_K} rolling MADs from the "
    "rolling median of the 24 trailing hours (causal window). THE "
    "robust alternative to w06's mean/std z-score: one burst inflates "
    "a standard deviation and masks the next burst, while median/MAD "
    "barely move. Exactness: both statistics are pure in-row "
    "selections (w30's device) — sort the slice, index at ceil(n/2); "
    "MAD adds one absolute-deviation transform before the second "
    "selection; zero rounding devices needed. Scale: the hourly "
    "pre-agg bounds the series per type; slices stay in-row (no "
    "self-join); per-type output. Ref parity: the reference anomaly "
    "flags (src/enhanced_spark_etl.py:713-737) with the robust "
    "statistic swapped in",
)
def w32_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.analytics import _hourly_series

    return hampel_from_hourly(_hourly_series(spark, sf_dir))


def hampel_from_hourly(hourly_grid: DataFrame) -> DataFrame:
    """The w32 selection pass over any (event_type, h, hv DECIMAL) grid —
    shared with t30's streaming state table so the monitor equals batch
    w32 bit-for-bit under any micro-batch slicing."""
    hourly = hourly_grid.select(
        "event_type", "h", F.col("hv").cast("double").alias("x")
    )
    ser = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "x"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "x"))),
            lambda s: s["h"],
        ).alias("hs"),
    )

    def row_for(t):
        start = F.greatest(t - 24, F.lit(1))
        return F.struct(
            F.element_at("hs", t).alias("h"),
            F.element_at("xs", t).alias("x"),
            F.array_sort(
                F.slice(F.col("xs"), start, (t - 1) - start + 1)
            ).alias("w"),
        )

    ex = ser.select(
        "event_type",
        F.explode(
            F.transform(
                F.sequence(F.lit(_W32_MIN_WIN + 1), F.size("xs")),
                lambda t: row_for(t),
            )
        ).alias("r"),
    )
    w = F.col("r.w")
    n = F.size(w)
    med = F.element_at(w, F.ceil(n / F.lit(2.0)).cast("int"))
    staged = ex.select(
        "event_type",
        F.col("r.h").alias("h"),
        F.col("r.x").alias("x"),
        w.alias("w"),
        med.alias("med"),
    )
    mad = F.element_at(
        F.array_sort(
            F.transform(F.col("w"), lambda v: F.abs(v - F.col("med")))
        ),
        F.ceil(F.size("w") / F.lit(2.0)).cast("int"),
    )
    flags = staged.select(
        "event_type",
        "h",
        F.when(
            F.abs(F.col("x") - F.col("med"))
            > F.lit(float(_W32_K)) * mad,
            1,
        )
        .otherwise(0)
        .alias("flagged"),
    )
    return flags.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.sum("flagged").cast("bigint").alias("n_flagged"),
        F.max(F.when(F.col("flagged") == 1, F.col("h")))
        .cast("bigint")
        .alias("last_flagged_hour"),
    )


# --- w33 (ext.): calendar-aligned deltas (DoD / WoW) ---------------------------------


@register(
    "w33_calendar_deltas",
    # Day-over-day and week-over-week comparisons must align on the
    # CALENDAR offset (h-24, h-168), not the previous OBSERVED row —
    # lag() over a gappy series silently compares Monday 3am to Sunday
    # 11pm. Self-joins on the exact hour offsets leave NULL deltas
    # where the comparison period is missing (the honest answer).
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT c.event_type, c.h, c.x,
           c.x - d.x AS dod_delta,
           c.x - w.x AS wow_delta,
           d.x IS NULL AS dod_missing,
           w.x IS NULL AS wow_missing
    FROM hourly c
    LEFT JOIN hourly d ON d.event_type = c.event_type
                      AND d.h = c.h - 24
    LEFT JOIN hourly w ON w.event_type = c.event_type
                      AND w.h = c.h - 168
    """,
    doc="w33 (ext.): calendar-aligned day-over-day / week-over-week "
    "deltas per event type — offset self-joins on the exact h-24 and "
    "h-168 hours, with NULL deltas (and explicit missing flags) when "
    "the comparison hour has no data, the alignment bug lag() hides "
    "on gappy series. The comparison primitive under every ops "
    "dashboard's 'vs yesterday / vs last week' tile (q07/q11's "
    "profiles show the shape; this measures the change). Scale: "
    "three-way self-join of the calendar-bounded hourly grid, "
    "co-partitioned on event_type+h; subtraction of identical "
    "doubles — no rounding device. Ref parity: reference WoW report "
    "(src/app.py:151-170)",
)
def w33_calendar_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.analytics import _hourly_series

    hourly = _hourly_series(spark, sf_dir).select(
        "event_type", "h", F.col("hv").cast("double").alias("x")
    )
    d = hourly.select(
        F.col("event_type").alias("et_d"),
        F.col("h").alias("h_d"),
        F.col("x").alias("x_d"),
    )
    w = hourly.select(
        F.col("event_type").alias("et_w"),
        F.col("h").alias("h_w"),
        F.col("x").alias("x_w"),
    )
    return (
        hourly.join(
            d,
            (F.col("et_d") == F.col("event_type"))
            & (F.col("h_d") == F.col("h") - 24),
            "left",
        )
        .join(
            w,
            (F.col("et_w") == F.col("event_type"))
            & (F.col("h_w") == F.col("h") - 168),
            "left",
        )
        .select(
            "event_type",
            "h",
            "x",
            (F.col("x") - F.col("x_d")).alias("dod_delta"),
            (F.col("x") - F.col("x_w")).alias("wow_delta"),
            F.col("x_d").isNull().alias("dod_missing"),
            F.col("x_w").isNull().alias("wow_missing"),
        )
    )


# --- w34 (ext.): max drawdown of per-cohort signed-flow equity curves ------------------

_W34_POS = ("purchase", "signup")  # inflow types; all others are outflows
_W34_COHORTS = 8


def daily_flow_grid(events_df: DataFrame) -> DataFrame:
    """(cohort, day, flow) signed daily net-flow grid — the sufficient
    state for w34's drawdown pass. flow is an exact DECIMAL(27,6) sum, so
    partial grids merge by groupBy-SUM under any slicing (the property
    t32's streaming maintainer relies on)."""
    sec = F.floor(F.unix_timestamp("ts")).cast("bigint")
    signed = F.when(
        F.col("event_type").isin(*_W34_POS), F.col("value").cast(_DEC)
    ).otherwise(-F.col("value").cast(_DEC))
    return (
        events_df.select(
            (F.col("user_id") % _W34_COHORTS).alias("cohort"),
            F.floor((sec - 1704067200) / 86400.0).cast("bigint").alias("day"),
            signed.alias("f"),
        )
        .groupBy("cohort", "day")
        .agg(F.sum("f").cast(_DEC).alias("flow"))
    )


def drawdown_from_daily(grid: DataFrame) -> DataFrame:
    """Equity-curve drawdown over the daily grid: cum running sum,
    running max, dd = runmax - cum; per cohort the max drawdown, its
    trough day (earliest day attaining it) and the peak/final balances.
    All window math stays in exact decimals; doubles only on output."""
    w = W.partitionBy("cohort").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    wfull = W.partitionBy("cohort")
    staged = (
        grid.select("cohort", "day", "flow", F.sum("flow").over(w).alias("cum"))
        .withColumn("runmax", F.max("cum").over(w))
        .withColumn("dd", F.col("runmax") - F.col("cum"))
        .withColumn("mdd", F.max("dd").over(wfull))
    )
    return staged.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("flow").cast("double").alias("final_balance"),
        F.max("cum").cast("double").alias("peak_balance"),
        F.max("dd").cast("double").alias("max_drawdown"),
        F.min(F.when(F.col("dd") == F.col("mdd"), F.col("day")))
        .cast("bigint")
        .alias("trough_day"),
    )


_W34_ORACLE = """
    WITH daily AS (
      SELECT CAST(user_id % 8 AS BIGINT) AS cohort,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 86400.0) AS BIGINT) AS day,
             CAST(SUM(CASE WHEN event_type IN ('purchase', 'signup')
                      THEN CAST(value AS DECIMAL(27,6))
                      ELSE -CAST(value AS DECIMAL(27,6)) END)
                  AS DECIMAL(27,6)) AS flow
      FROM events GROUP BY 1, 2
    ),
    eq AS (
      SELECT cohort, day, flow,
             SUM(flow) OVER (PARTITION BY cohort ORDER BY day) AS cum
      FROM daily
    ),
    dd AS (
      SELECT cohort, day, flow, cum,
             MAX(cum) OVER (PARTITION BY cohort ORDER BY day) - cum AS dd
      FROM eq
    ),
    mx AS (SELECT cohort, MAX(dd) AS mdd FROM dd GROUP BY cohort)
    SELECT d.cohort,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(d.flow) AS DOUBLE) AS final_balance,
           CAST(MAX(d.cum) AS DOUBLE) AS peak_balance,
           CAST(MAX(d.dd) AS DOUBLE) AS max_drawdown,
           CAST(MIN(CASE WHEN d.dd = m.mdd THEN d.day END) AS BIGINT)
             AS trough_day
    FROM dd d JOIN mx m USING (cohort)
    GROUP BY d.cohort
"""


@register(
    "w34_max_drawdown",
    # Classic equity-curve risk measure over the signed event flows:
    # inflows (purchase/signup) minus outflows per user cohort per day;
    # cum running balance, running peak, drawdown = peak - balance.
    # Exactness: flows, cumulative sums, running maxima and the
    # drawdown comparison all stay in exact decimals (order-free);
    # doubles appear only in the final projection, so no rounding
    # device is needed. Day is unique within a cohort, so the window
    # ordering is total on both engines.
    oracle=_W34_ORACLE,
    doc="w34 (ext.): maximum drawdown + trough day of each cohort's "
    "signed daily net-flow equity curve (inflow types purchase/"
    "signup vs all-outflow others) — the peak-to-valley risk "
    "measure behind 'worst losing streak' dashboard tiles. The "
    "daily grid is one map-combined decimal aggregate (state "
    "bounded by cohorts x days); the window pass runs per cohort "
    "over that grid, never over raw events. Split as "
    "daily_flow_grid + drawdown_from_daily so t32's streaming "
    "monitor maintains the grid incrementally and certifies "
    "against this exact oracle. Ref parity: rolling running-total "
    "trend reports (src/enhanced_spark_etl.py:260-287)",
)
def w34_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return drawdown_from_daily(daily_flow_grid(ev))


# --- w35 (ext.): 14-day RSI (Cutler's simple-average form) ------------------------------

# Daily close CTE shared by w35/w36 oracles: exact-decimal daily totals
# per event type (the m37/w34 day-grid device).
_W3X_DAILY_SQL = """
    daily AS (
      SELECT event_type,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                        / 86400.0) AS BIGINT) AS day,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DECIMAL(27,6)) AS z
      FROM events GROUP BY 1, 2
    )"""

# One shared RSI string: both rolling sums are exact decimals, so the
# ratio is the only float op (ROUND(,6); the loss-free branch pins 100).
_W35_RSI = (
    "ROUND(CASE WHEN l14 = 0 THEN CAST(100 AS DOUBLE)"
    " ELSE 100 - 100 / (1 + CAST(g14 AS DOUBLE) / CAST(l14 AS DOUBLE))"
    " END, 6)"
)


@register(
    "w35_rsi",
    # Overbought/oversold momentum gauge on each event type's daily
    # demand series: RSI = 100 - 100/(1 + avgGain/avgLoss) over the
    # trailing 14 OBSERVED days (Cutler's simple-average form — the
    # windowed variant, unlike Wilder's recursive EMA, is an exact
    # frame aggregate). Day-over-day deltas, gains, losses and both
    # 14-row sums all stay in exact DECIMAL(27,6) (order-free); the
    # single ratio is one shared double string. Rows with fewer than
    # 14 trailing deltas are excluded (COUNT over the same frame).
    # Scale: one map-combined daily aggregate collapses the fact
    # table; every window runs on the bounded (type x day) grid.
    oracle=f"""
    WITH {_W3X_DAILY_SQL.strip()},
    d AS (
      SELECT event_type, day, z,
             z - LAG(z) OVER (PARTITION BY event_type ORDER BY day)
               AS diff
      FROM daily
    ),
    g AS (
      SELECT event_type, day,
             CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS g14,
             CAST(SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS l14,
             COUNT(diff) OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS n_deltas
      FROM d
    )
    SELECT event_type, day,
           CAST(g14 AS DOUBLE) AS gain14,
           CAST(l14 AS DOUBLE) AS loss14,
           {_W35_RSI} AS rsi
    FROM g WHERE n_deltas = 14
    """,
    doc="w35 (ext.): 14-day relative strength index (Cutler's form) per "
    "event type's daily demand — the classic momentum oscillator "
    "('overbought' > 70, 'oversold' < 30) as a pure window pipeline: "
    "exact-decimal deltas, gain/loss splits and 14-row frame sums "
    "with ONE shared-string double ratio at the end. Simple-average "
    "RSI (not Wilder's recursive smoothing) is chosen precisely "
    "because it is a frame aggregate — mergeable, sort-free beyond "
    "the bounded daily grid, identical at 100 TB. Completes the "
    "technical-screen family: w07 SMA/EMA level, w21 CUSUM drift, "
    "w25 EWMA control, w35 momentum. No reference analog — extension",
)
def w35_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(
                (F.floor(F.unix_timestamp("ts")).cast("bigint") - 1704067200)
                / 86400.0
            )
            .cast("bigint")
            .alias("day"),
            F.col("value").cast("decimal(27,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(27,6)").alias("z"))
    )
    wo = W.partitionBy("event_type").orderBy("day")
    wf = wo.rowsBetween(-13, 0)
    d = daily.select(
        "event_type", "day", "z",
        (F.col("z") - F.lag("z").over(wo)).alias("diff"),
    )
    g = d.select(
        "event_type", "day",
        F.sum(
            F.when(F.col("diff") > 0, F.col("diff")).otherwise(F.lit(0))
        )
        .over(wf)
        .cast("decimal(27,6)")
        .alias("g14"),
        F.sum(
            F.when(F.col("diff") < 0, -F.col("diff")).otherwise(F.lit(0))
        )
        .over(wf)
        .cast("decimal(27,6)")
        .alias("l14"),
        F.count("diff").over(wf).alias("n_deltas"),
    )
    return g.filter(F.col("n_deltas") == 14).select(
        "event_type", "day",
        F.col("g14").cast("double").alias("gain14"),
        F.col("l14").cast("double").alias("loss14"),
        F.expr(_W35_RSI).alias("rsi"),
    )


# --- w36 (ext.): Donchian channel + Williams %R -----------------------------------------

_W36_POS = (
    "ROUND(CAST(z - lo14 AS DOUBLE) / CAST(hi14 - lo14 AS DOUBLE), 6)"
)
_W36_WILLR = (
    "ROUND(-100 * CAST(hi14 - z AS DOUBLE)"
    " / CAST(hi14 - lo14 AS DOUBLE), 6)"
)


@register(
    "w36_donchian_channel",
    # Where does today's demand sit inside its trailing 14-day range?
    # Donchian channel (rolling high/low) + the channel position and
    # Williams %R oscillator, plus breakout flags (close AT the rolling
    # extreme). MAX/MIN frame aggregates are order-free and exact on
    # decimals — no rounding device anywhere except the two output
    # ratios (shared strings, NULL on a flat channel via the hi > lo
    # guard). Incomplete 14-row frames are excluded. Scale: windows run
    # on the bounded (type x day) grid, never raw events.
    oracle=f"""
    WITH {_W3X_DAILY_SQL.strip()},
    g AS (
      SELECT event_type, day, z,
             CAST(MAX(z) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS hi14,
             CAST(MIN(z) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS lo14,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS n_days
      FROM daily
    )
    SELECT event_type, day,
           CAST(z AS DOUBLE) AS close,
           CAST(hi14 AS DOUBLE) AS hi14,
           CAST(lo14 AS DOUBLE) AS lo14,
           CASE WHEN hi14 > lo14 THEN {_W36_POS} END AS channel_pos,
           CASE WHEN hi14 > lo14 THEN {_W36_WILLR} END AS williams_r,
           z = hi14 AS breakout_high,
           z = lo14 AS breakout_low
    FROM g WHERE n_days = 14
    """,
    doc="w36 (ext.): 14-day Donchian channel per event type's daily "
    "demand — rolling high/low band, the in-channel position, the "
    "Williams %R oscillator and at-the-extreme breakout flags. The "
    "range-location companion to w35's momentum RSI: %R says where "
    "in the recent range today sits, RSI says how it got there. "
    "Pure exact-decimal MAX/MIN frame aggregates (order-free, no "
    "rounding device) with two shared-string output ratios, NULL on "
    "flat channels. Windows run on the bounded daily grid — "
    "identical plan at 100 TB. No reference analog — extension",
)
def w36_donchian_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(
                (F.floor(F.unix_timestamp("ts")).cast("bigint") - 1704067200)
                / 86400.0
            )
            .cast("bigint")
            .alias("day"),
            F.col("value").cast("decimal(27,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(27,6)").alias("z"))
    )
    wf = W.partitionBy("event_type").orderBy("day").rowsBetween(-13, 0)
    g = daily.select(
        "event_type", "day", "z",
        F.max("z").over(wf).cast("decimal(27,6)").alias("hi14"),
        F.min("z").over(wf).cast("decimal(27,6)").alias("lo14"),
        F.count("*").over(wf).alias("n_days"),
    )
    flat = F.col("hi14") > F.col("lo14")
    return g.filter(F.col("n_days") == 14).select(
        "event_type", "day",
        F.col("z").cast("double").alias("close"),
        F.col("hi14").cast("double").alias("hi14"),
        F.col("lo14").cast("double").alias("lo14"),
        F.when(flat, F.expr(_W36_POS)).alias("channel_pos"),
        F.when(flat, F.expr(_W36_WILLR)).alias("williams_r"),
        (F.col("z") == F.col("hi14")).alias("breakout_high"),
        (F.col("z") == F.col("lo14")).alias("breakout_low"),
    )


# --- w37 (ext.): Aroon indicator via packed-argmax windows ------------------------------

# Shared output strings: ages are exact BIGINT day gaps, so each Aroon
# line is one rounded double ratio.
_W37_UP = "ROUND(100 * (13 - CAST(age_hi AS DOUBLE)) / 13, 6)"
_W37_DN = "ROUND(100 * (13 - CAST(age_lo AS DOUBLE)) / 13, 6)"
_W37_OSC = (
    "ROUND(100 * (CAST(age_lo AS DOUBLE) - CAST(age_hi AS DOUBLE))"
    " / 13, 6)"
)


@register(
    "w37_aroon_indicator",
    # HOW RECENT are the rolling extremes? Aroon-Up/Down: 100 scaled
    # freshness of the 14-day high/low (100 = the extreme is today,
    # 0 = it is 13 days stale). w36's Donchian says WHERE in the range
    # today sits; Aroon says WHEN the range was set — an aging trend's
    # highs go stale before its level breaks. Device: "day of the
    # rolling max" is not a Spark/ANSI window primitive, so both
    # engines compute it as MAX over ONE packed DECIMAL(38,0):
    # (micro-quantized value + 1e18 offset) * 1e5 + biased day — the
    # high part orders by value, the low part breaks ties toward the
    # most recent day (the Aroon convention), and pack % 1e5 decodes
    # the argmax day exactly. The 1e18 offset keeps negative daily
    # sums orderable (|daily sum| < 1e12 documented bound); the day
    # bias keeps the modulo positive for |day| < 50000. Aroon-Down
    # negates the value part so the same MAX picks the minimum with
    # the same recency tie-break. All integers until three shared
    # rounded ratios. Windows run on the bounded (type x day) grid.
    oracle=f"""
    WITH {_W3X_DAILY_SQL.strip()},
    q AS (
      SELECT event_type, day, z,
             CAST(z * 1000000 AS BIGINT) AS zm,
             day + 50000 AS pd
      FROM daily
    ),
    p AS (
      SELECT event_type, day, z,
             (CAST(zm AS DECIMAL(38,0)) + 1000000000000000000) * 100000
               + pd AS pack_hi,
             (1000000000000000000 - CAST(zm AS DECIMAL(38,0))) * 100000
               + pd AS pack_lo
      FROM q
    ),
    g AS (
      SELECT event_type, day, z,
             CAST(MAX(pack_hi) OVER (PARTITION BY event_type
                 ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               % 100000 AS BIGINT) - 50000 AS hi_day,
             CAST(MAX(pack_lo) OVER (PARTITION BY event_type
                 ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               % 100000 AS BIGINT) - 50000 AS lo_day,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS n_days
      FROM p
    ),
    a AS (
      SELECT event_type, day, z,
             day - hi_day AS age_hi,
             day - lo_day AS age_lo,
             n_days
      FROM g
    )
    SELECT event_type, day,
           CAST(z AS DOUBLE) AS close,
           age_hi AS days_since_high,
           age_lo AS days_since_low,
           {_W37_UP} AS aroon_up,
           {_W37_DN} AS aroon_down,
           {_W37_OSC} AS aroon_osc
    FROM a WHERE n_days = 14
    """,
    doc="w37 (ext.): Aroon indicator per event type's daily demand — "
    "Aroon-Up/Down (scaled freshness of the trailing 14-day "
    "high/low) and the oscillator, plus the raw extreme ages. "
    "Completes the w35/w36 technical triad: RSI reads momentum, "
    "Donchian reads range position, Aroon reads extreme RECENCY. "
    "Argmax-in-frame is computed on both engines as MAX over one "
    "packed DECIMAL(38,0) (offset value * 1e5 + biased day) whose "
    "low digits decode the most-recent extreme day exactly — no "
    "self-join, no Spark-only max_by, deterministic ties. Windows "
    "run on the bounded daily grid — identical plan at 100 TB. "
    "No reference analog — extension per brief",
)
def w37_aroon_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(
                (F.floor(F.unix_timestamp("ts")).cast("bigint") - 1704067200)
                / 86400.0
            )
            .cast("bigint")
            .alias("day"),
            F.col("value").cast("decimal(27,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(27,6)").alias("z"))
    )
    q = daily.select(
        "event_type", "day", "z",
        (F.col("z") * 1000000).cast("bigint").alias("zm"),
        (F.col("day") + 50000).alias("pd"),
    )
    off = F.lit(1000000000000000000).cast("decimal(38,0)")
    p = q.select(
        "event_type", "day", "z",
        ((F.col("zm").cast("decimal(38,0)") + off) * 100000
         + F.col("pd")).alias("pack_hi"),
        ((off - F.col("zm").cast("decimal(38,0)")) * 100000
         + F.col("pd")).alias("pack_lo"),
    )
    wf = W.partitionBy("event_type").orderBy("day").rowsBetween(-13, 0)
    g = p.select(
        "event_type", "day", "z",
        ((F.max("pack_hi").over(wf) % 100000).cast("bigint") - 50000)
        .alias("hi_day"),
        ((F.max("pack_lo").over(wf) % 100000).cast("bigint") - 50000)
        .alias("lo_day"),
        F.count("*").over(wf).alias("n_days"),
    )
    a = g.select(
        "event_type", "day", "z",
        (F.col("day") - F.col("hi_day")).alias("age_hi"),
        (F.col("day") - F.col("lo_day")).alias("age_lo"),
        "n_days",
    )
    return a.filter(F.col("n_days") == 14).select(
        "event_type", "day",
        F.col("z").cast("double").alias("close"),
        F.col("age_hi").alias("days_since_high"),
        F.col("age_lo").alias("days_since_low"),
        F.expr(_W37_UP).alias("aroon_up"),
        F.expr(_W37_DN).alias("aroon_down"),
        F.expr(_W37_OSC).alias("aroon_osc"),
    )


# --- w38 (ext.): Ulcer Index (rolling quadratic-mean drawdown) --------------------------

# Shared strings: the per-day percentage drawdown off the trailing
# 14-day high (rounded once, so the squared copies below are exact),
# and the final quadratic mean.
_W38_DD = (
    "ROUND(100 * CAST(hi14 - z AS DOUBLE) / CAST(hi14 AS DOUBLE), 6)"
)
_W38_ULCER = "ROUND(SQRT(CAST(sq14 AS DOUBLE) / 14), 6)"


@register(
    "w38_ulcer_index",
    # HOW PAINFUL is the recent dip profile — not just how deep?
    # Ulcer Index: the quadratic mean of the trailing 14 daily
    # percentage drawdowns off the rolling 14-day high. w34 reads the
    # single worst peak-to-trough over a whole cohort history; w38 is
    # the ROLLING depth-AND-duration gauge (a long shallow sag scores
    # like a short crash — exactly what max-drawdown hides). Device:
    # two chained windows on the bounded daily grid — the exact-
    # decimal rolling MAX (w36's device) feeds a per-day drawdown
    # rounded ONCE (shared string), whose square is stored as an
    # exact DECIMAL(18,6); the second frame SUM is then order-free on
    # both engines, and the final sqrt-of-mean is one shared string.
    # Rows need 14 defined drawdowns (positive rolling high).
    oracle=f"""
    WITH {_W3X_DAILY_SQL.strip()},
    g AS (
      SELECT event_type, day, z,
             CAST(MAX(z) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS hi14
      FROM daily
    ),
    dd AS (
      SELECT event_type, day, z, hi14,
             CASE WHEN hi14 > 0 THEN
               CAST(ROUND({_W38_DD} * {_W38_DD}, 6) AS DECIMAL(18,6))
             END AS ddsq
      FROM g
    ),
    u AS (
      SELECT event_type, day, z,
             CAST(SUM(ddsq) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS sq14,
             COUNT(ddsq) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS n_dd
      FROM dd
    )
    SELECT event_type, day,
           CAST(z AS DOUBLE) AS close,
           {_W38_ULCER} AS ulcer14
    FROM u WHERE n_dd = 14
    """,
    doc="w38 (ext.): 14-day Ulcer Index per event type's daily demand "
    "— the quadratic-mean percentage drawdown off the rolling high, "
    "the depth-times-duration pain gauge that separates a lingering "
    "slump from a blip (w34's max drawdown sees only the worst "
    "point; w35/w36/w37 read momentum/range/recency). Two chained "
    "frame windows on the bounded daily grid: exact-decimal rolling "
    "MAX, once-rounded drawdown (shared string), squares summed as "
    "DECIMAL so the frame aggregate is order-free, one shared "
    "sqrt-of-mean string. Identical plan at 100 TB. No reference "
    "analog — extension per brief",
)
def w38_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(
                (F.floor(F.unix_timestamp("ts")).cast("bigint") - 1704067200)
                / 86400.0
            )
            .cast("bigint")
            .alias("day"),
            F.col("value").cast("decimal(27,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(27,6)").alias("z"))
    )
    wf = W.partitionBy("event_type").orderBy("day").rowsBetween(-13, 0)
    g = daily.select(
        "event_type", "day", "z",
        F.max("z").over(wf).cast("decimal(27,6)").alias("hi14"),
    )
    dd = g.select(
        "event_type", "day", "z",
        F.when(
            F.col("hi14") > 0,
            F.expr(f"ROUND({_W38_DD} * {_W38_DD}, 6)").cast(
                "decimal(18,6)"
            ),
        ).alias("ddsq"),
    )
    u = dd.select(
        "event_type", "day", "z",
        F.sum("ddsq").over(wf).cast("decimal(27,6)").alias("sq14"),
        F.count("ddsq").over(wf).alias("n_dd"),
    )
    return u.filter(F.col("n_dd") == 14).select(
        "event_type", "day",
        F.col("z").cast("double").alias("close"),
        F.expr(_W38_ULCER).alias("ulcer14"),
    )


# --- w39 (ext.): Chande momentum oscillator ----------------------------------------------

# One shared CMO string: both frame sums are exact decimals, so the
# normalized ratio is the only float op (zero-range frames -> NULL).
_W39_CMO = (
    "ROUND(100 * CAST(su - sd AS DOUBLE) / CAST(su + sd AS DOUBLE), 6)"
)


@register(
    "w39_chande_momentum",
    # BOUNDED momentum with symmetric normalization: CMO = 100 *
    # (gains - losses)/(gains + losses) over the trailing 14 daily
    # deltas — w35's RSI maps the same two sums through an asymmetric
    # 100 - 100/(1+g/l) curve that compresses the loss side; CMO is
    # the odd-symmetric variant (+100 pure uptrend, -100 pure
    # downtrend, 0 balance) chartists read for divergence. Device is
    # w35's verbatim: exact-decimal daily deltas, two conditional
    # frame sums, ONE shared rounded ratio, NULL when the 14-day
    # range is flat (su + sd = 0), incomplete frames excluded.
    # Windows run on the calendar-bounded daily grid.
    oracle=f"""
    WITH {_W3X_DAILY_SQL.strip()},
    d AS (
      SELECT event_type, day, z,
             z - LAG(z) OVER (PARTITION BY event_type ORDER BY day)
               AS diff
      FROM daily
    ),
    g AS (
      SELECT event_type, day,
             CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END)
                 OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS su,
             CAST(SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END)
                 OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS sd,
             COUNT(diff) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS n_deltas
      FROM d
    )
    SELECT event_type, day,
           CAST(su AS DOUBLE) AS gain14,
           CAST(sd AS DOUBLE) AS loss14,
           CASE WHEN su + sd > 0 THEN {_W39_CMO} END AS cmo
    FROM g WHERE n_deltas = 14
    """,
    doc="w39 (ext.): 14-day Chande momentum oscillator per event "
    "type's daily demand — the odd-symmetric bounded momentum line "
    "(+100/-100 saturation, 0 balance) built from the same exact-"
    "decimal gain/loss frame sums as w35's RSI but normalized "
    "symmetrically, which is what makes CMO readable for divergence "
    "and overbought thresholds at +/-50. One shared rounded ratio, "
    "NULL on flat frames, bounded daily grid — identical plan at "
    "100 TB. No reference analog — extension per brief; completes "
    "the w35-w38 technical-indicator family",
)
def w39_chande_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(
                (F.floor(F.unix_timestamp("ts")).cast("bigint") - 1704067200)
                / 86400.0
            )
            .cast("bigint")
            .alias("day"),
            F.col("value").cast("decimal(27,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(27,6)").alias("z"))
    )
    wo = W.partitionBy("event_type").orderBy("day")
    wf = wo.rowsBetween(-13, 0)
    d = daily.select(
        "event_type", "day", "z",
        (F.col("z") - F.lag("z").over(wo)).alias("diff"),
    )
    g = d.select(
        "event_type", "day",
        F.sum(
            F.when(F.col("diff") > 0, F.col("diff")).otherwise(F.lit(0))
        )
        .over(wf)
        .cast("decimal(27,6)")
        .alias("su"),
        F.sum(
            F.when(F.col("diff") < 0, -F.col("diff")).otherwise(F.lit(0))
        )
        .over(wf)
        .cast("decimal(27,6)")
        .alias("sd"),
        F.count("diff").over(wf).alias("n_deltas"),
    )
    return g.filter(F.col("n_deltas") == 14).select(
        "event_type", "day",
        F.col("su").cast("double").alias("gain14"),
        F.col("sd").cast("double").alias("loss14"),
        F.when(
            F.col("su") + F.col("sd") > 0, F.expr(_W39_CMO)
        ).alias("cmo"),
    )
