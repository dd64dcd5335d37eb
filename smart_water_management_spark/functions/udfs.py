"""UDF surface (SURVEY.md §2.12): the engine's four user-function tiers.

The reference registers two row-at-a-time Python UDFs
(`src/enhanced_spark_etl.py:60-86`: ``classify_consumption_pattern``,
``classify_anomaly_severity``). Row UDFs serialize every row through a
Python worker — the slow path. This module exposes the full Spark UDF
ladder and makes the fast path the default:

1. **when-chain column expression** (JVM-side, whole-stage codegen) —
   the preferred re-expression of both reference UDFs; zero Python cost.
2. **row ``udf``** — kept for parity with the reference's registration
   surface (`spark.udf.register` makes it SQL-visible).
3. **scalar ``pandas_udf``** — Arrow-batched, ~10-100× faster than row
   UDFs when Python is genuinely needed.
4. **grouped-agg ``pandas_udf``** (≈UDAF) and **``applyInPandas``**
   (≈ grouped-map UDTF) — the custom-aggregate / custom-table-function
   tier the reference lacks but our EMA/embedding extensions need.

Note: the reference's ``22 <= hour <= 5`` branch
(`src/enhanced_spark_etl.py:69`) is dead code in Python (no hour
satisfies both); we implement the intended ``hour >= 22 OR hour <= 5``
night band and document the deviation here.

At 100 TB: tiers 1 stays in codegen; tiers 3-5 move Arrow batches —
partition sizing (``spark.sql.files.maxPartitionBytes``) bounds the
per-batch memory; nothing here collects to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from ..registry import register
from ..sources.catalog import load_table

# --- tier 1: JVM when-chain versions (the engine's hot path) ----------------


def consumption_pattern_expr(value: Column, hour: Column) -> Column:
    """F1 as a pure column expression (no Python worker)."""
    return (
        F.when(hour.between(6, 9), F.lit("morning_peak"))
        .when(hour.between(18, 21), F.lit("evening_peak"))
        .when((hour >= 22) | (hour <= 5), F.lit("night_low"))
        .otherwise(F.lit("daytime_normal"))
    )


def anomaly_severity_expr(z: Column, score: Column) -> Column:
    """F2 as a pure column expression."""
    az = F.abs(z)
    return (
        F.when((az > 4) | (score > 0.9), F.lit("critical"))
        .when((az > 3) | (score > 0.7), F.lit("high"))
        .when((az > 2) | (score > 0.5), F.lit("medium"))
        .otherwise(F.lit("low"))
    )


# --- tier 2/3: row UDF + Arrow scalar pandas_udf ----------------------------


def _pattern_py(value: float, hour: int) -> str:
    if hour is None:
        return "daytime_normal"
    if 6 <= hour <= 9:
        return "morning_peak"
    if 18 <= hour <= 21:
        return "evening_peak"
    if hour >= 22 or hour <= 5:
        return "night_low"
    return "daytime_normal"


@pandas_udf(StringType())
def severity_pandas_udf(z: pd.Series, score: pd.Series) -> pd.Series:
    """F2 as an Arrow-batched scalar pandas UDF (vectorized numpy ops)."""
    az = z.abs()
    out = pd.Series("low", index=z.index, dtype="object")
    out[(az > 2) | (score > 0.5)] = "medium"
    out[(az > 3) | (score > 0.7)] = "high"
    out[(az > 4) | (score > 0.9)] = "critical"
    return out


@pandas_udf(DoubleType())
def weighted_mean_udaf(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDF (≈UDAF): quality-weighted mean.

    Used with ``groupBy(...).agg(weighted_mean_udaf(...))`` — Spark ships
    each group's columns as Arrow arrays; the reduction runs in numpy.

    The sums quantize each term to the 1e-6 grid and accumulate as exact
    int64 micro-units — the UDAF expression of the engine's decimal-sum
    device (functions/numeric.py): a plain float ``(v*w).sum()`` depends
    on Arrow batch order and drifted past round(,6) against the oracle
    once groups reached sf0.1 size (caught by the 10×-SF parity sweep).
    """
    import numpy as np

    num = int(np.rint((v * w).to_numpy() * 1e6).astype(np.int64).sum())
    den = int(np.rint(w.to_numpy() * 1e6).astype(np.int64).sum())
    return float(num / 1e6) / float(den / 1e6) if den else None


def register_sql_udfs(spark: SparkSession) -> None:
    """`spark.udf.register` surface (reference src/enhanced_spark_etl.py:74,86)
    so the functions are visible to `spark.sql` text queries."""
    spark.udf.register("classify_consumption_pattern", _pattern_py, StringType())


# --- tier 4: applyInPandas (grouped-map ≈ UDTF) -----------------------------


def _normalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score normalization (sample stddev, ddof=1 to match
    SQL STDDEV_SAMP). Mean and stddev come from exact integer-micro
    moment sums (values are 2-decimal), so the z-scores cannot drift
    against the decimal-moment oracle at any group size or Arrow batch
    order — the f11 lesson applied ahead of failure."""
    import math

    import numpy as np

    v = pdf["value"].to_numpy()
    n = len(v)
    micro = np.rint(v * 1e6).astype(np.int64)
    sx = float(int(micro.sum()) / 1e6)
    # v has 2 decimals -> v*v has 4, exact on the micro grid
    sx2 = float(int(np.rint(v * v * 1e6).astype(np.int64).sum()) / 1e6)
    pdf = pdf.copy()
    if n > 1:
        var = (n * sx2 - sx * sx) / (n * (n - 1.0))
        sd = math.sqrt(var) if var > 0 else 0.0
        mu = sx / n
        pdf["value_z"] = ((pdf["value"] - mu) / sd if sd > 0 else 0.0)
    else:
        pdf["value_z"] = 0.0
    pdf["value_z"] = pdf["value_z"].round(6)
    return pdf[["event_id", "user_id", "value", "value_z"]]


# --- registered queries -----------------------------------------------------


@register(
    "f09_udf_consumption_pattern",
    oracle="""
    SELECT event_id,
           CASE WHEN EXTRACT(hour FROM ts) BETWEEN 6 AND 9 THEN 'morning_peak'
                WHEN EXTRACT(hour FROM ts) BETWEEN 18 AND 21 THEN 'evening_peak'
                WHEN EXTRACT(hour FROM ts) >= 22 OR EXTRACT(hour FROM ts) <= 5
                  THEN 'night_low'
                ELSE 'daytime_normal' END AS pattern,
           CASE WHEN EXTRACT(hour FROM ts) BETWEEN 6 AND 9 THEN 'morning_peak'
                WHEN EXTRACT(hour FROM ts) BETWEEN 18 AND 21 THEN 'evening_peak'
                WHEN EXTRACT(hour FROM ts) >= 22 OR EXTRACT(hour FROM ts) <= 5
                  THEN 'night_low'
                ELSE 'daytime_normal' END AS pattern_udf
    FROM events
    WHERE user_id % 20 = 0
    """,
    doc="F1: consumption pattern — when-chain vs registered SQL row UDF "
    "(reference src/enhanced_spark_etl.py:63-74)",
)
def f09_udf_consumption_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sql_udfs(spark)
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    # Same classification twice: the codegen fast path and the registered
    # row UDF — the oracle proves they agree. A deterministic 1-in-20
    # sensor slice keeps the deliberately-slow row-at-a-time path cheap;
    # the equality proof doesn't need every row.
    return spark.sql(
        """
        SELECT event_id, pattern,
               classify_consumption_pattern(value, hour(ts)) AS pattern_udf
        FROM (SELECT event_id, value, ts, {expr} AS pattern
              FROM events WHERE user_id % 20 = 0)
        """.format(expr="""
          CASE WHEN hour(ts) BETWEEN 6 AND 9 THEN 'morning_peak'
               WHEN hour(ts) BETWEEN 18 AND 21 THEN 'evening_peak'
               WHEN hour(ts) >= 22 OR hour(ts) <= 5 THEN 'night_low'
               ELSE 'daytime_normal' END""")
    )


@register(
    "f10_pandas_udf_severity",
    oracle="""
    WITH s AS (
      SELECT event_id,
             (value - AVG(value) OVER ()) / STDDEV_SAMP(value) OVER () AS z,
             1.0 / (1.0 + EXP(-value / 100.0)) AS score
      FROM events
    )
    SELECT event_id,
           CASE WHEN ABS(z) > 4 OR score > 0.9 THEN 'critical'
                WHEN ABS(z) > 3 OR score > 0.7 THEN 'high'
                WHEN ABS(z) > 2 OR score > 0.5 THEN 'medium'
                ELSE 'low' END AS severity
    FROM s
    """,
    doc="F2: anomaly severity via Arrow scalar pandas_udf "
    "(reference src/enhanced_spark_etl.py:77-87)",
)
def f10_pandas_udf_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # global mean/std as a one-row aggregate broadcast back — NOT an
    # unpartitioned window, which would funnel the whole table through a
    # single task at scale
    stats = ev.agg(
        F.avg("value").alias("__mu"), F.stddev_samp("value").alias("__sd")
    )
    z = (F.col("value") - F.col("__mu")) / F.col("__sd")
    score = 1.0 / (1.0 + F.exp(-F.col("value") / 100.0))
    return ev.crossJoin(F.broadcast(stats)).select(
        "event_id", severity_pandas_udf(z, score).alias("severity")
    )


@register(
    "f11_grouped_agg_udaf",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value * (1.0 + (event_id % 5)) AS DECIMAL(27,6)))
                AS DOUBLE)
             / CAST(SUM(CAST(1.0 + (event_id % 5) AS DECIMAL(27,6)))
                    AS DOUBLE) AS weighted_avg
    FROM events
    GROUP BY user_id
    """,
    doc="grouped-agg pandas_udf (≈UDAF): quality-weighted mean per user — "
    "the custom-aggregate tier the reference lacks (SURVEY.md §2.12)",
)
def f11_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "w", 1.0 + (F.col("event_id") % 5)
    )
    # unrounded: the exact-micro-sum quotient is bit-identical across
    # engines, while round() at a decimal midpoint is not (the p90 rule)
    return ev.groupBy("user_id").agg(
        weighted_mean_udaf(F.col("value"), F.col("w")).alias("weighted_avg")
    )


@register(
    "f12_apply_in_pandas_norm",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(COUNT(value) OVER w AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(value*value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx2
      FROM events WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id, value,
           ROUND(CASE WHEN n > 1 AND (n*sx2 - sx*sx)/(n*(n-1.0)) > 0
                 THEN (value - sx/n)
                      / sqrt((n*sx2 - sx*sx)/(n*(n-1.0)))
                 ELSE 0.0 END, 6) AS value_z
    FROM t
    """,
    doc="applyInPandas grouped-map (≈UDTF): per-user z-normalization; "
    "one shuffle on the group key, Arrow batches per group",
)
def f12_apply_in_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        _normalize_group,
        schema="event_id long, user_id long, value double, value_z double",
    )
