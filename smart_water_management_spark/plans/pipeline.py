"""Domain-fixture e2e pipeline (SURVEY.md §3.1 + §5.2.4).

Re-expresses the reference's synthetic fixture factory
(`src/data_generator.py:8-101`: 20 sensors × 5 districts × 4 types ×
30 days × 24 h = 14,400 readings, diurnal flow peaks ×1.5 / night ×0.3,
5% anomaly injection, quality ∈ [0.7, 1.0]) and its flagship pipeline
(`src/enhanced_spark_etl.py:816-913`: read → quality → features →
windows → score → aggregate) as ONE lazy Spark plan.

The generator is fully distributed and deterministic: rows come from
``sequence()`` + ``explode`` (no driver loop, no rand()) and every
"random" draw is a pure column expression over ``xxhash64`` — the same
fixture materializes identically on a laptop or a 1000-executor cluster,
at any partitioning. BENCH bar (BASELINE.md): the 14,400-record pipeline
end-to-end in ≤10 s locally; scale knob ``n_days`` takes it to billions
of rows without changing the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.udfs import anomaly_severity_expr, consumption_pattern_expr
from ..registry import register

DISTRICTS = ["Central", "North", "South", "East", "West"]
SENSOR_TYPES = ["flow", "pressure", "quality", "temperature"]


def _u(seed: int, *cols: Column) -> Column:
    """Deterministic uniform [0,1) from a hash of the row identity."""
    return (F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(1_000_000)) / 1_000_000.0)


def _gauss(seed: int, *cols: Column) -> Column:
    """Deterministic ≈N(0,1): Irwin-Hall sum of 4 hashed uniforms,
    centered and rescaled (std of the sum is sqrt(4/12))."""
    s = sum(_u(seed + i, *cols) for i in range(4))
    return (s - F.lit(2.0)) / F.lit(0.5773502691896258)


def generate_readings(
    spark: SparkSession, n_days: int = 30, start: str = "2024-01-01"
) -> DataFrame:
    """Distributed fixture generator: sensors × hours cross join.

    20 sensor rows broadcast against an exploded hour spine — the 100 TB
    version raises n_days/sensor count and repartitions on sensor_id; no
    step depends on a driver loop.
    """
    sensors = spark.range(20).select(
        F.format_string("WS_%03d", F.col("id") + 1).alias("sensor_id"),
        # reference nests type inside district loop: id 1..4 Central, 5..8 North…
        F.element_at(
            F.array(*[F.lit(d) for d in DISTRICTS]),
            (F.col("id") / 4).cast("int") + 1,
        ).alias("district"),
        F.element_at(
            F.array(*[F.lit(t) for t in SENSOR_TYPES]),
            (F.col("id") % 4).cast("int") + 1,
        ).alias("sensor_type"),
    )
    hours = spark.sql(
        f"""SELECT explode(sequence(
              timestamp'{start} 00:00:00',
              timestamp'{start} 00:00:00' + make_interval(0,0,0,{n_days},0,0,0)
                - interval 1 hour,
              interval 1 hour)) AS ts"""
    )
    rows = sensors.crossJoin(hours)
    hr = F.hour("ts")
    peak = hr.between(6, 9) | hr.between(18, 21)
    night = (hr >= 22) | (hr <= 5)
    g = _gauss(1, F.col("sensor_id"), F.col("ts"))
    flow_base = F.lit(50.0) * F.when(peak, 1.5).when(night, 0.3).otherwise(1.0)
    pressure_base = F.lit(40.0) - F.when(peak, 5.0).otherwise(0.0)
    value = (
        F.when(
            F.col("sensor_type") == "flow",
            F.greatest(F.lit(0.0), flow_base + g * flow_base * 0.2),
        )
        .when(
            F.col("sensor_type") == "pressure",
            F.greatest(F.lit(10.0), pressure_base + g * 3.0),
        )
        .when(
            F.col("sensor_type") == "quality",
            F.least(F.lit(9.0), F.greatest(F.lit(6.0), F.lit(7.2) + g * 0.3)),
        )
        .otherwise(F.least(F.lit(25.0), F.greatest(F.lit(2.0), F.lit(15.0) + g * 3.0)))
    )
    unit = (
        F.when(F.col("sensor_type") == "flow", "L/s")
        .when(F.col("sensor_type") == "pressure", "PSI")
        .when(F.col("sensor_type") == "quality", "pH")
        .otherwise("C")
    )
    return rows.select(
        "ts",
        "sensor_id",
        "sensor_type",
        "district",
        F.round(value, 2).alias("value"),
        unit.alias("unit"),
        F.round(0.7 + 0.3 * _u(7, F.col("sensor_id"), F.col("ts")), 3).alias(
            "quality_score"
        ),
        (_u(13, F.col("sensor_id"), F.col("ts")) < 0.05).cast("int").alias(
            "anomaly_flag"
        ),
    )


def enrich(readings: DataFrame) -> DataFrame:
    """Feature + window stage (reference stages 2-4): calendar features,
    consumption pattern, 24-row rolling stats per sensor, rolling z-score,
    severity class. One shuffle (hash-partition by sensor_id for the
    window sort) covers every windowed column."""
    w24 = W.partitionBy("sensor_id").orderBy("ts").rowsBetween(-23, 0)
    enriched = readings.withColumns(
        {
            "year": F.year("ts"),
            "month": F.month("ts"),
            "day": F.dayofmonth("ts"),
            "hour": F.hour("ts"),
            "pattern": consumption_pattern_expr(F.col("value"), F.hour("ts")),
            "rolling_avg": F.avg("value").over(w24),
            "rolling_std": F.stddev_samp("value").over(w24),
        }
    )
    z = F.when(
        F.col("rolling_std") > 0,
        (F.col("value") - F.col("rolling_avg")) / F.col("rolling_std"),
    ).otherwise(0.0)
    return enriched.withColumns(
        {
            "z_score": z,
            "severity": anomaly_severity_expr(z, F.lit(0.0)),
            "is_outlier": (F.abs(z) > 2.5).cast("int"),
        }
    )


def daily_rollup(enriched: DataFrame) -> DataFrame:
    """Aggregate stage (reference stage 5, src/spark_etl.py:172-182):
    district × type × day rollup with derived anomaly/outlier rates."""
    return (
        enriched.groupBy("district", "sensor_type", "year", "month", "day")
        .agg(
            F.count("*").alias("n_readings"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.sum("anomaly_flag").alias("n_anomalies"),
            F.sum("is_outlier").alias("n_outliers"),
        )
        .withColumn(
            "anomaly_rate",
            F.round(F.col("n_anomalies") / F.col("n_readings"), 4),
        )
    )


@register(
    "p90_domain_pipeline",
    oracle=None,  # hash-seeded generator is Spark-specific; invariants in tests
    doc="e2e domain pipeline: distributed 14,400-reading fixture → features "
    "→ rolling windows → daily rollup (reference flagship, "
    "src/enhanced_spark_etl.py:816-913)",
)
def p90_domain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    readings = generate_readings(spark)
    return daily_rollup(enrich(readings)).orderBy(
        "district", "sensor_type", "year", "month", "day"
    )
