"""Domain-fixture e2e pipeline (SURVEY.md §3.1 + §5.2.4).

Re-expresses the reference's synthetic fixture factory
(`src/data_generator.py:8-101`: 20 sensors × 5 districts × 4 types ×
30 days × 24 h = 14,400 readings, diurnal flow peaks ×1.5 / night ×0.3,
5% anomaly injection, quality ∈ [0.7, 1.0]) and its flagship pipeline
(`src/enhanced_spark_etl.py:816-913`: read → quality → features →
windows → score → aggregate) as ONE lazy Spark plan.

The generator is fully distributed and deterministic: rows come from
``sequence()`` + ``explode`` (no driver loop, no rand()) and every
"random" draw is a pure column expression over ``md5`` of the row
identity — the same fixture materializes identically on a laptop or a
1000-executor cluster, at any partitioning, and (since round 5) in
DuckDB, which is what gives the e2e pipeline an exact oracle. BENCH bar (BASELINE.md): the 14,400-record pipeline
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


def _u(tag: str, key: Column, chunk: int = 1) -> Column:
    """Deterministic uniform [0,1): 32 bits of md5 over the row identity.
    md5 (not xxhash64) so the draw is reproducible in ANY engine — this
    is what makes p90 exact-oracle-checkable in DuckDB (round-5 upgrade;
    previously rows-only). ``chunk`` selects one of the digest's four
    8-hex windows, so a single hash yields four independent uniforms
    (Catalyst's subexpression elimination computes the shared md5 once).
    At pure-ingest scale, swap for xxhash64 and give up the oracle."""
    md = F.md5(F.concat_ws("|", F.lit(tag), key))
    hx = F.substring(md, 1 + 8 * (chunk - 1), 8)
    return F.conv(hx, 16, 10).cast("long") / F.lit(4294967296.0)


def _gauss(tag: str, key: Column) -> Column:
    """Deterministic ≈N(0,1): Irwin-Hall sum of the four chunk-uniforms
    of ONE md5 digest, centered and rescaled (std of the sum is
    sqrt(4/12)). Left-fold addition order matches the SQL twin so the
    doubles are bit-identical."""
    s = sum(_u(tag, key, chunk=i) for i in range(1, 5))
    return (s - F.lit(2.0)) / F.lit(0.5773502691896258)


def _u_xx(seed: int, *cols: Column) -> Column:
    """Pure-ingest-scale uniform: xxhash64 (JVM-native, ~4× the md5
    throughput at generator volume). Partitioning-independent like the
    md5 path but NOT reproducible outside Spark — the ``draws="xxhash64"``
    generator mode trades the cross-engine oracle for speed."""
    return F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(1_000_000)) / 1_000_000.0


def _gauss_xx(seed: int, *cols: Column) -> Column:
    s = sum(_u_xx(seed + i, *cols) for i in range(4))
    return (s - F.lit(2.0)) / F.lit(0.5773502691896258)


def generate_readings(
    spark: SparkSession,
    n_days: int = 30,
    start: str = "2024-01-01",
    draws: str = "md5",
) -> DataFrame:
    """Distributed fixture generator: sensors × hours cross join.

    20 sensor rows broadcast against an exploded hour spine — the 100 TB
    version raises n_days/sensor count and repartitions on sensor_id; no
    step depends on a driver loop.

    ``draws`` picks the hash behind the deterministic randomness:
    ``"md5"`` (default) is reproducible in any engine and powers p90's
    exact DuckDB oracle; ``"xxhash64"`` is the pure-ingest-scale mode
    (~4× generator throughput, JVM-native hash, no cross-engine oracle).
    Both are partitioning-independent; the soak test exercises both.
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
    # Row-identity key for the hash draws; formatted explicitly so the
    # DuckDB oracle builds the byte-identical string via strftime.
    key = F.concat_ws(
        "|", F.col("sensor_id"), F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    if draws == "xxhash64":
        g = _gauss_xx(1, F.col("sensor_id"), F.col("ts"))
        u_quality = _u_xx(7, F.col("sensor_id"), F.col("ts"))
        u_anomaly = _u_xx(13, F.col("sensor_id"), F.col("ts"))
    elif draws == "md5":
        g = _gauss("g", key)
        u_quality = _u("q", key, chunk=1)
        u_anomaly = _u("q", key, chunk=2)
    else:
        raise ValueError(f"unknown draws mode: {draws}")
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
        F.round(0.7 + 0.3 * u_quality, 3).alias("quality_score"),
        (u_anomaly < 0.05).cast("int").alias("anomaly_flag"),
    )


def enrich(readings: DataFrame) -> DataFrame:
    """Feature + window stage (reference stages 2-4): calendar features,
    consumption pattern, 24-row rolling stats per sensor, rolling z-score,
    severity class. One shuffle (hash-partition by sensor_id for the
    window sort) covers every windowed column. Rolling mean/std come from
    exact decimal moments (the w06 device) so the doubles — and hence the
    outlier flags — are engine-exact for the DuckDB oracle."""
    w24 = W.partitionBy("sensor_id").orderBy("ts").rowsBetween(-23, 0)
    n24 = F.count("value").over(w24).cast("double")
    sx = F.sum(F.col("value").cast("decimal(27,6)")).over(w24).cast("double")
    sx2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(27,6)"))
        .over(w24)
        .cast("double")
    )
    var = (n24 * sx2 - sx * sx) / (n24 * (n24 - F.lit(1.0)))
    enriched = readings.withColumns(
        {
            "year": F.year("ts"),
            "month": F.month("ts"),
            "day": F.dayofmonth("ts"),
            "hour": F.hour("ts"),
            "pattern": consumption_pattern_expr(F.col("value"), F.hour("ts")),
            "rolling_avg": sx / n24,
            "rolling_std": F.when(
                n24 > 1, F.sqrt(F.greatest(var, F.lit(0.0)))
            ),
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
    from ..functions.numeric import davg

    return (
        enriched.groupBy("district", "sensor_type", "year", "month", "day")
        .agg(
            F.count("*").alias("n_readings"),
            # unrounded: the exact-decimal-sum quotient is bit-identical
            # across engines, while round() at a decimal midpoint is not
            # (Spark rounds the shortest string, DuckDB the raw binary)
            davg("value").alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            davg("quality_score").alias("avg_quality"),
            F.sum("anomaly_flag").alias("n_anomalies"),
            F.sum("is_outlier").alias("n_outliers"),
        )
        .withColumn(
            "anomaly_rate",
            F.round(F.col("n_anomalies") / F.col("n_readings"), 4),
        )
    )


# One uniform draw in DuckDB: an 8-hex chunk of md5("<tag>|<sensor>|<ts>")
# — four independent uniforms per digest, mirroring the Spark side.
_SQL_U = (
    "CAST(('0x' || substr(md5('{tag}' || '|' || sensor_id || '|' || tsk), {pos}, 8)) "
    "AS BIGINT) / 4294967296.0"
)

# Full e2e oracle: regenerate the md5-seeded fixture, replay the window +
# z-score + outlier stages with the same exact decimal moments, and
# aggregate the identical daily rollup — DuckDB reproduces every draw and
# every double bit-for-bit because all float arithmetic happens AFTER
# exact integer/decimal reductions.
_P90_ORACLE = f"""
WITH sensors AS (
  SELECT printf('WS_%03d', i + 1) AS sensor_id,
         (['Central','North','South','East','West'])[(i // 4) + 1] AS district,
         (['flow','pressure','quality','temperature'])[(i % 4) + 1] AS sensor_type
  FROM (SELECT range AS i FROM range(20))
),
spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-30 23:00:00',
                                INTERVAL 1 HOUR)) AS ts
),
base AS (
  SELECT s.*, p.ts, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS tsk, hour(p.ts) AS hr
  FROM sensors s CROSS JOIN spine p
),
drawn AS (
  SELECT *,
         {_SQL_U.format(tag='g', pos=1)} AS u1,
         {_SQL_U.format(tag='g', pos=9)} AS u2,
         {_SQL_U.format(tag='g', pos=17)} AS u3,
         {_SQL_U.format(tag='g', pos=25)} AS u4,
         {_SQL_U.format(tag='q', pos=1)} AS u7,
         {_SQL_U.format(tag='q', pos=9)} AS u13
  FROM base
),
gz AS (
  SELECT *,
         ((((u1 + u2) + u3) + u4) - 2.0) / 0.5773502691896258 AS g,
         (hr BETWEEN 6 AND 9) OR (hr BETWEEN 18 AND 21) AS peak,
         (hr >= 22) OR (hr <= 5) AS night
  FROM drawn
),
bases AS (
  SELECT *,
         50.0 * (CASE WHEN peak THEN 1.5 WHEN night THEN 0.3 ELSE 1.0 END) AS flow_base,
         40.0 - (CASE WHEN peak THEN 5.0 ELSE 0.0 END) AS pressure_base
  FROM gz
),
vals AS (
  SELECT sensor_id, district, sensor_type, ts,
         round(CASE
           WHEN sensor_type = 'flow'
             THEN greatest(0.0, flow_base + g * flow_base * 0.2)
           WHEN sensor_type = 'pressure'
             THEN greatest(10.0, pressure_base + g * 3.0)
           WHEN sensor_type = 'quality'
             THEN least(9.0, greatest(6.0, 7.2 + g * 0.3))
           ELSE least(25.0, greatest(2.0, 15.0 + g * 3.0)) END, 2) AS value,
         round(0.7 + 0.3 * u7, 3) AS quality_score,
         CASE WHEN u13 < 0.05 THEN 1 ELSE 0 END AS anomaly_flag
  FROM bases
),
win AS (
  SELECT *,
         CAST(COUNT(value) OVER w AS DOUBLE) AS n24,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx2
  FROM vals
  WINDOW w AS (PARTITION BY sensor_id ORDER BY ts
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
),
zed AS (
  SELECT *,
         sx / n24 AS rolling_avg,
         CASE WHEN n24 > 1
              THEN sqrt(greatest((n24 * sx2 - sx * sx) / (n24 * (n24 - 1.0)), 0.0))
         END AS rolling_std
  FROM win
),
flags AS (
  SELECT *,
         CASE WHEN rolling_std > 0
              THEN CASE WHEN abs((value - rolling_avg) / rolling_std) > 2.5
                        THEN 1 ELSE 0 END
              ELSE 0 END AS is_outlier
  FROM zed
)
SELECT district, sensor_type,
       year(ts) AS year, month(ts) AS month, day(ts) AS day,
       COUNT(*) AS n_readings,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value)
         AS avg_value,
       round(MIN(value), 2) AS min_value,
       round(MAX(value), 2) AS max_value,
       CAST(SUM(CAST(quality_score AS DECIMAL(27,6))) AS DOUBLE)
         / COUNT(quality_score) AS avg_quality,
       CAST(SUM(anomaly_flag) AS BIGINT) AS n_anomalies,
       CAST(SUM(is_outlier) AS BIGINT) AS n_outliers,
       round(CAST(SUM(anomaly_flag) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 4)
         AS anomaly_rate
FROM flags
GROUP BY district, sensor_type, year(ts), month(ts), day(ts)
"""


@register(
    "p90_domain_pipeline",
    oracle=_P90_ORACLE,
    doc="e2e domain pipeline: distributed 14,400-reading fixture → features "
    "→ rolling windows → daily rollup (reference flagship, "
    "src/enhanced_spark_etl.py:816-913). Exact-oracle since round 5: "
    "md5-seeded draws + decimal-moment windows make every value "
    "engine-reproducible",
)
def p90_domain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    readings = generate_readings(spark)
    return daily_rollup(enrich(readings)).orderBy(
        "district", "sensor_type", "year", "month", "day"
    )
