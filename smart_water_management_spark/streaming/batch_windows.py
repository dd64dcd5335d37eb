"""Time-window operators in batch form (SURVEY.md §2.11 T6-T8): tumbling,
sliding, and session windows over the event stream — the batch twins of
the Structured Streaming jobs in ``streaming.jobs`` (same expressions, so
batch results are the oracle for the streaming path).

Reference: the hourly pre-aggregate table sql/enhanced_data_schema.sql:279-322
(T7 → tumbling), "sliding window analytics" src/enhanced_spark_etl.py:255-336
(T6 → sliding), and the never-populated anomaly-event sessionization schema
sql/enhanced_data_schema.sql:325-360 (T8 → session windows, implemented
here as gaps-and-islands: lag + cumulative sum of gap flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table

_DEC = "decimal(27,6)"


# --- T7: tumbling 1-hour windows (the hourly pre-aggregate).
@register(
    "t01_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
    """,
    doc="T7: tumbling 1h window aggregate (hourly pre-aggregate table)",
)
def t01_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


# --- T6: sliding windows (1 hour every 15 minutes) — each event belongs to
# exactly 4 overlapping windows.
@register(
    "t02_sliding_windows",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
    GROUP BY 1
    """,
    doc="T6: sliding 1h/15min windows (4-way overlap per event)",
)
def t02_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# --- T8: sessionization, batch form — gaps-and-islands with a 30-minute gap
# (lag + running sum of new-session flags; SURVEY §4.3.3).
@register(
    "t03_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             -- truncated-seconds diff, matching Spark's cast(ts AS long):
             -- a fractional gap straddling exactly 1800s must sessionize
             -- identically on both engines
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="T8: session windows (30min gap) via gaps-and-islands in batch",
)
def t03_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("long") - prev_ts.cast("long")) > 1800),
        1,
    ).otherwise(0)
    flagged = ev.withColumn("is_new", is_new)
    wsum = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, 0
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("duration_sec"),
    )


# --- T5: staleness/freshness monitor (reference flags >24h-stale sensors,
# src/enhanced_spark_etl.py:172-183 — the batch watermark analog).
@register(
    "t04_staleness_monitor",
    oracle="""
    WITH latest AS (
      SELECT user_id, MAX(ts) AS last_seen FROM events GROUP BY user_id
    )
    SELECT user_id,
           strftime(last_seen, '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(date_diff('second', last_seen, TIMESTAMP '2024-01-31 00:00:00') AS BIGINT)
             AS staleness_sec,
           CASE WHEN date_diff('second', last_seen, TIMESTAMP '2024-01-31 00:00:00') > 86400
                THEN 1 ELSE 0 END AS is_stale
    FROM latest
    """,
    doc="T5: per-key freshness/staleness monitor vs reference cutoff",
)
def t04_staleness_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    now = F.lit("2024-01-31 00:00:00").cast("timestamp")
    latest = ev.groupBy("user_id").agg(F.max("ts").alias("last_seen"))
    staleness = now.cast("long") - F.col("last_seen").cast("long")
    return latest.select(
        "user_id",
        F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        staleness.alias("staleness_sec"),
        F.when(staleness > 86400, 1).otherwise(0).alias("is_stale"),
    )


# --- t16 (ext.): watermark lateness profile ----------------------------------

# Candidate watermark delays to price. (label, SQL interval literal).
LATENESS_DELAYS = [
    ("0s", "INTERVAL 0 SECOND", 0),
    ("1h", "INTERVAL 1 HOUR", 3600),
    ("6h", "INTERVAL 6 HOUR", 21600),
    ("24h", "INTERVAL 24 HOUR", 86400),
]


@register(
    "t16_watermark_lateness_profile",
    oracle=f"""
    WITH arr AS (
      SELECT ts, md5(CAST(event_id AS VARCHAR)) AS hx, event_id FROM events
    ),
    seen AS (
      SELECT ts,
             MAX(ts) OVER (ORDER BY hx, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS high
      FROM arr
    ),
    agg AS (
      SELECT COUNT(*) AS n_total,
             {", ".join(
                 f"COUNT(CASE WHEN high > ts + {iv} THEN 1 END) AS late_{lb}"
                 for lb, iv, _ in LATENESS_DELAYS
             )}
      FROM seen
    )
    {" UNION ALL ".join(
        f"SELECT '{lb}' AS delay, CAST({secs} AS BIGINT) AS delay_secs,"
        f" CAST(late_{lb} AS BIGINT) AS n_late, n_total,"
        f" CAST(late_{lb} AS DOUBLE) / n_total AS late_frac FROM agg"
        for lb, _, secs in LATENESS_DELAYS
    )}
    """,
    doc="t16 (ext.): watermark lateness profile — the tuning table read "
    "BEFORE setting withWatermark(): for each candidate delay D, how "
    "many rows would arrive more than D behind the stream's running "
    "max event time and be dropped. Arrival sequence here is a "
    "deterministic md5 shuffle of event_id (the fixture's at-least-once "
    "delivery simulation — the parquet fixture arrives perfectly "
    "ordered, which would profile to all-zeros; a production feed "
    "passes its real arrival sequence/offset instead). Scale shape: the "
    "running max is a DISTRIBUTED PREFIX SCAN — 256 md5-prefix blocks, "
    "within-block running max (block-bounded window) combined with the "
    "cumulative max of prior blocks' maxima (a 256-row constant-size "
    "window) — so no window partition ever holds more than 1/256th of "
    "the stream; lateness tests are pure timestamp comparisons (no "
    "float), late_frac an unrounded quotient of exact ints",
)
def t16_watermark_lateness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "ts",
        F.md5(F.col("event_id").cast("string")).alias("hx"),
        "event_id",
    ).withColumn("blk", F.substring("hx", 1, 2))

    # Within-block running max over the (hx, event_id) arrival order.
    w_in = (
        W.partitionBy("blk")
        .orderBy("hx", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    within = arr.withColumn("high_in", F.max("ts").over(w_in))

    # Prefix maxima across blocks: 256 rows, constant at any scale.
    blocks = arr.groupBy("blk").agg(F.max("ts").alias("bmax"))
    w_blk = W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
    prefix = blocks.select(
        "blk", F.max("bmax").over(w_blk).alias("high_prev")
    )

    seen = within.join(F.broadcast(prefix), "blk").withColumn(
        "high", F.greatest("high_in", "high_prev")
    )
    agg = seen.agg(
        F.count("*").alias("n_total"),
        *[
            F.count(
                F.when(F.col("high") > F.col("ts") + F.expr(iv), 1)
            ).alias(f"late_{lb}")
            for lb, iv, _ in LATENESS_DELAYS
        ],
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lb).alias("delay"),
                    F.lit(secs).cast("bigint").alias("delay_secs"),
                    F.col(f"late_{lb}").cast("bigint").alias("n_late"),
                )
                for lb, _, secs in LATENESS_DELAYS
            ]
        )
    ).alias("r")
    return agg.select(rows, "n_total").select(
        F.col("r.delay").alias("delay"),
        F.col("r.delay_secs").alias("delay_secs"),
        F.col("r.n_late").alias("n_late"),
        "n_total",
        (F.col("r.n_late").cast("double") / F.col("n_total")).alias(
            "late_frac"
        ),
    )
