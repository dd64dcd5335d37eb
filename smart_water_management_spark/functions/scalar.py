"""Scalar function surface (SURVEY.md §2.8): date/time, math, string, JSON,
conditional/cast families, each registered as an oracle-checked query.

Reference sites: date hierarchy src/spark_etl.py:71-75,
src/enhanced_spark_etl.py:211-233 (incl. sin/cos cyclical encodings),
warehouse date attrs src/warehouse_loader.py:92-111; string slugs/matching
src/warehouse_loader.py:181, src/enhanced_ingestion.py:716-737; JSON
flattening src/enhanced_ingestion.py:548-704; zero-guarded division
src/spark_etl.py:122-124.

Cross-engine notes baked into the oracles: Spark `dayofweek` is 1=Sunday
while DuckDB's is 0=Sunday (+1 shift); both use ISO `weekofyear`;
transcendental results are rounded to 6 dp (libm vs StrictMath ulps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


# --- Date/time family.
@register(
    "f01_datetime_functions",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS yr,
           CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS dom,
           CAST(hour(ts) AS INT) AS hr,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(weekofyear(ts) AS INT) AS woy,
           CAST(quarter(ts) AS INT) AS qtr,
           strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_7d,
           CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS INT) AS days_since_epoch_start,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec,
           COUNT(*) AS n
    FROM events
    GROUP BY ALL
    """,
    doc="date/time builtins: year..quarter, date_add, datediff, unix_timestamp",
)
def f01_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hr"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("woy"),
        F.quarter("ts").alias("qtr"),
        F.date_format(F.date_add(F.to_date("ts"), 7), "yyyy-MM-dd").alias("plus_7d"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.col("ts").cast("long").alias("unix_sec"),
    ).agg(F.count("*").alias("n"))


# --- Day/month names + weekend/season/fiscal attributes (reference
# src/warehouse_loader.py:92-111 builds these in pandas; here pure builtins).
@register(
    "f02_date_attributes",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           dayname(ts) AS day_name,
           monthname(ts) AS month_name,
           CASE WHEN dayofweek(ts) IN (0, 6) THEN TRUE ELSE FALSE END AS is_weekend,
           CASE WHEN month(ts) IN (12, 1, 2) THEN 'winter'
                WHEN month(ts) IN (3, 4, 5) THEN 'spring'
                WHEN month(ts) IN (6, 7, 8) THEN 'summer'
                ELSE 'autumn' END AS season,
           CAST(CASE WHEN month(ts) >= 4 THEN year(ts) + 1 ELSE year(ts) END AS INT) AS fiscal_year,
           CAST(floor((month(ts) + 8) % 12 / 3) + 1 AS INT) AS fiscal_quarter,
           COUNT(*) AS n
    FROM events
    GROUP BY ALL
    """,
    doc="derived calendar attributes: names, weekend, season, fiscal (Apr start)",
)
def f02_date_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mo = F.month("ts")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "EEEE").alias("day_name"),
        F.date_format("ts", "MMMM").alias("month_name"),
        F.dayofweek("ts").isin([1, 7]).alias("is_weekend"),
        F.when(mo.isin(12, 1, 2), "winter")
        .when(mo.isin(3, 4, 5), "spring")
        .when(mo.isin(6, 7, 8), "summer")
        .otherwise("autumn")
        .alias("season"),
        F.when(mo >= 4, F.year("ts") + 1).otherwise(F.year("ts")).alias("fiscal_year"),
        (((mo + 8) % 12 / 3).cast("int") + 1).alias("fiscal_quarter"),
    ).agg(F.count("*").alias("n"))


# --- Math family (sin/cos cyclical encodings per reference
# src/enhanced_spark_etl.py:228-233; geo distance :242-244).
@register(
    "f03_math_functions",
    oracle="""
    SELECT event_id,
           ABS(value - 250.0) AS abs_dev,
           ROUND(value, 1) AS rounded,
           CAST(FLOOR(value) AS BIGINT) AS floored,
           CAST(CEIL(value) AS BIGINT) AS ceiled,
           ROUND(SQRT(value), 6) AS sqrt_v,
           GREATEST(value, 100.0) AS clamped_lo,
           LEAST(value, 400.0) AS clamped_hi,
           ROUND(SIN(2 * PI() * hour(ts) / 24.0), 6) + 0.0 AS hour_sin,
           ROUND(COS(2 * PI() * hour(ts) / 24.0), 6) + 0.0 AS hour_cos,
           CASE WHEN value <> 0 THEN ROUND(100.0 / value, 6) ELSE 0.0 END AS inv_pct
    FROM events
    """,
    doc="math builtins: abs/round/floor/ceil/sqrt/greatest/least/sin/cos + zero guard",
)
def f03_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    two_pi_h = 2 * F.lit(3.141592653589793) * F.hour("ts") / 24.0
    return ev.select(
        "event_id",
        F.abs(v - 250.0).alias("abs_dev"),
        F.round(v, 1).alias("rounded"),
        F.floor(v).alias("floored"),
        F.ceil(v).alias("ceiled"),
        F.round(F.sqrt(v), 6).alias("sqrt_v"),
        F.greatest(v, F.lit(100.0)).alias("clamped_lo"),
        F.least(v, F.lit(400.0)).alias("clamped_hi"),
        # +0.0 folds IEEE -0.0 to +0.0 on both engines (ROUND(COS(3*pi/2),6)
        # is -0.0 in DuckDB but 0.0 in Spark — numerically equal, hash-distinct).
        (F.round(F.sin(two_pi_h), 6) + F.lit(0.0)).alias("hour_sin"),
        (F.round(F.cos(two_pi_h), 6) + F.lit(0.0)).alias("hour_cos"),
        F.when(v != 0, F.round(100.0 / v, 6)).otherwise(0.0).alias("inv_pct"),
    )


# --- String family (slug/matching/substring per reference
# src/warehouse_loader.py:181, src/enhanced_ingestion.py:716-737).
@register(
    "f04_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(replace(p_type, ' ', '_')) AS type_slug,
           substr(p_name, 1, 10) AS name_prefix,
           length(p_name) AS name_len,
           concat(p_brand, '/', p_type) AS brand_type,
           CASE WHEN contains(p_type, 'BRUSHED') THEN 1 ELSE 0 END AS is_brushed,
           CASE WHEN starts_with(p_type, 'STANDARD') THEN 1 ELSE 0 END AS is_standard,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           split_part(p_name, ' ', 1) AS first_word,
           trim(concat(' ', p_name, ' ')) AS trimmed
    FROM part
    """,
    doc="string builtins: case, slug, substring, concat, contains, regexp_extract, split",
)
def f04_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower(F.replace(F.col("p_type"), F.lit(" "), F.lit("_"))).alias("type_slug"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.when(F.col("p_type").contains("BRUSHED"), 1).otherwise(0).alias("is_brushed"),
        F.when(F.col("p_type").startswith("STANDARD"), 1).otherwise(0).alias(
            "is_standard"
        ),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


# --- JSON family (API payload flattening per reference
# src/enhanced_ingestion.py:548-704 → get_json_object / from_json).
@register(
    "f05_json_functions",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON extraction: get_json_object + cast, grouped",
)
def f05_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("int").alias("k")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
    )


# --- from_json with explicit schema → struct access (the typed path).
@register(
    "f06_from_json_struct",
    oracle="""
    SELECT (CAST(json_extract_string(props, '$.k') AS INT) % 10) AS k_bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    doc="from_json with StructType schema, nested field access",
)
def f06_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "parsed", F.from_json("props", "k INT")
    )
    return parsed.groupBy(
        (F.col("parsed.k") % 10).alias("k_bucket")
    ).agg(F.count("*").alias("n"))


# --- Array/map surface (engine extension for embeddings per SURVEY §2.8:
# transform / filter / aggregate / zip_with higher-order functions).
@register(
    "f07_array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum') AS DOUBLE), 4) AS vec_sum,
           ROUND(CAST(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS DOUBLE), 4) AS sq_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
    doc="array HOFs: transform/aggregate/filter over embedding vectors",
)
def f07_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("vec_sum"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x), 4
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


# --- Cast / conditional family (reference src/enhanced_spark_etl.py:169,
# src/data_validator.py:252-267).
@register(
    "f08_casts_conditionals",
    oracle="""
    SELECT CAST(l_quantity AS INT) AS qty_int,
           CAST(CAST(l_extendedprice AS DECIMAL(15,2)) AS VARCHAR) AS price_str,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN l_discount > 0.05 THEN 'discounted' ELSE 'full' END AS price_class,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ALL
    """,
    doc="casts int/decimal/string, nullif+coalesce, case classification",
)
def f08_casts_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(15,2)").cast("string").alias("price_str"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.when(F.col("l_discount") > 0.05, "discounted")
        .otherwise("full")
        .alias("price_class"),
    ).agg(F.count("*").alias("n"))


# --- Geo distance (reference src/enhanced_spark_etl.py:242-244 computes a
# planar sqrt/pow distance between sensor coordinates; the haversine twin
# is the correct-on-a-sphere upgrade). Coordinates derive deterministically
# from user_id (the testdata carries no lat/lon columns).
_EARTH_R_KM = 6371.0
_SITE_LAT, _SITE_LON = 51.5, -0.12  # reference plant site


@register(
    "f13_geo_distance",
    oracle=f"""
    WITH pts AS (
      SELECT DISTINCT user_id,
             (user_id % 120) - 60 + 0.25 AS lat,
             ((user_id * 7) % 360) - 180 + 0.25 AS lon
      FROM events
    )
    SELECT user_id, lat, lon,
           ROUND(SQRT(POW(lat - {_SITE_LAT}, 2) + POW(lon - ({_SITE_LON}), 2)), 6)
             AS planar_deg,
           ROUND(2 * {_EARTH_R_KM} * ASIN(SQRT(
               POW(SIN(RADIANS(lat - {_SITE_LAT}) / 2), 2)
               + COS(RADIANS(lat)) * COS(RADIANS({_SITE_LAT}))
                 * POW(SIN(RADIANS(lon - ({_SITE_LON})) / 2), 2)
           )), 6) AS haversine_km
    FROM pts
    """,
    doc="F13: geo distance — the reference's planar sqrt/pow degree "
    "distance plus the haversine great-circle upgrade, both pure "
    "column expressions in whole-stage codegen; one scan, no UDF",
)
def f13_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        (F.col("user_id") % 120 - 60 + 0.25).alias("lat"),
        ((F.col("user_id") * 7) % 360 - 180 + 0.25).alias("lon"),
    ).distinct()
    dlat = F.col("lat") - _SITE_LAT
    dlon = F.col("lon") - _SITE_LON
    planar = F.sqrt(F.pow(dlat, 2) + F.pow(dlon, 2))
    hav = (
        2
        * _EARTH_R_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(dlat) / 2), 2)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians(F.lit(_SITE_LAT)))
                * F.pow(F.sin(F.radians(dlon) / 2), 2)
            )
        )
    )
    return pts.select(
        "user_id",
        "lat",
        "lon",
        F.round(planar, 6).alias("planar_deg"),
        F.round(hav, 6).alias("haversine_km"),
    )


# --- F14: bitwise scalar + aggregate functions -------------------------------
# Flag words are how wide tables pack dozens of boolean facts into one
# BIGINT column; the engine must both build them (shiftleft/|) and fold
# them (bit_and = "flags every row set", bit_or = "flags any row set",
# bit_xor = parity). Derived per event from deterministic row facts so
# both engines assemble identical words, then folded per user.
@register(
    "f14_bitwise_aggs",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             CAST(
               (CASE WHEN event_type = 'error' THEN 1 ELSE 0 END << 0)
               | (CASE WHEN value > 50 THEN 1 ELSE 0 END << 1)
               | (CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END << 2)
               | (CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END << 3)
             AS BIGINT) AS flags
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(BIT_AND(flags) AS BIGINT) AS flags_all,
           CAST(BIT_OR(flags) AS BIGINT) AS flags_any,
           CAST(BIT_XOR(flags) AS BIGINT) AS flags_parity
    FROM flagged GROUP BY user_id
    """,
    doc="F14: bitwise flag-word assembly (conditional shifts OR-ed into "
    "one BIGINT) + bit_and/bit_or/bit_xor aggregate folds per user — "
    "the packed-boolean pattern wide 100 TB tables use instead of 30 "
    "nullable flag columns; one scan, one hash agg",
)
def f14_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bits = [
        F.when(F.col("event_type") == "error", 1).otherwise(0),
        F.when(F.col("value") > 50, 1).otherwise(0),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0),
        F.when(F.hour("ts") < 12, 1).otherwise(0),
    ]
    flags = bits[0]
    for i, b in enumerate(bits[1:], start=1):
        flags = flags.bitwiseOR(F.shiftleft(b, i))
    flags = flags.cast("bigint")
    return (
        ev.select("user_id", flags.alias("flags"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.bit_and("flags").alias("flags_all"),
            F.bit_or("flags").alias("flags_any"),
            F.bit_xor("flags").alias("flags_parity"),
        )
    )


# --- F15: edit-distance fuzzy matching ---------------------------------------
# Entity resolution's scalar core: Levenshtein distance between the
# stored name and its canonical re-derivation (zero when the row is
# well-formed; a corrupted variant — here a deterministic stand-in that
# drops the zero-padding for every 13th key — scores its edit cost).
# JVM-side levenshtein on both engines; one scan, one tiny agg.
@register(
    "f15_fuzzy_match",
    oracle="""
    WITH probe AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 13 = 0
                  THEN 'Customer#' || CAST(c_custkey AS VARCHAR)
                  ELSE c_name END AS observed,
             'Customer#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0')
               AS canonical
      FROM customer
    )
    SELECT CAST(levenshtein(observed, canonical) AS INT) AS edit_distance,
           COUNT(*) AS n_rows,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM probe GROUP BY 1
    """,
    doc="F15: Levenshtein fuzzy matching — observed vs canonical key-"
    "derived names (every 13th row deterministically corrupted by "
    "dropping zero-padding), grouped by edit distance. The entity-"
    "resolution scalar, JVM-side on both engines; one scan + tiny agg",
)
def f15_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    observed = F.when(
        F.col("c_custkey") % 13 == 0,
        F.concat(F.lit("Customer#"), F.col("c_custkey").cast("string")),
    ).otherwise(F.col("c_name"))
    canonical = F.concat(
        F.lit("Customer#"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")
    )
    return (
        c.select(
            "c_custkey",
            F.levenshtein(observed, canonical).cast("int").alias("edit_distance"),
        )
        .groupBy("edit_distance")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("c_custkey").cast("bigint").alias("min_key"),
            F.max("c_custkey").cast("bigint").alias("max_key"),
        )
    )


# --- f16: VARIANT semi-structured shredding (Spark 4) ------------------------


@register(
    "f16_variant_json",
    oracle="""
    SELECT (CAST(json_extract_string(props, '$.k') AS INT) % 10) AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value)
             AS avg_value,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY 1
    """,
    doc="F16 (ext.): Spark 4 VARIANT path for semi-structured columns — "
    "parse_json to the binary-encoded VARIANT type, typed variant_get "
    "extraction, then aggregate. Functionally equals f05's string-path "
    "get_json_object (the oracle), but at 100 TB VARIANT avoids "
    "re-tokenizing JSON text per access and shreds into columnar storage "
    "(SPARK-45891); the same query shape covers both",
)
def f16_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import davg

    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            davg("value").alias("avg_value"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --- F17: ANSI error-handling surface (try_* variants) -----------------------
@register(
    "f17_try_arithmetic",
    # Both engines run NULL-on-error semantics explicitly (Spark try_*,
    # DuckDB TRY_CAST + NULLIF guards), so the rows where ANSI mode
    # would throw become comparable NULLs.
    oracle="""
    SELECT event_id,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE ROUND(value / NULLIF(CAST(event_id % 10 AS DOUBLE), 0), 6)
           END AS safe_div,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(event_id AS VARCHAR) END AS BIGINT)
             AS parsed_id,
           TRY_CAST(props AS DOUBLE) AS props_as_num
    FROM events
    """,
    doc="F17: the ANSI-mode migration surface — try_divide / try_cast "
    "return NULL where strict ANSI arithmetic throws (div-by-zero, "
    "malformed casts), letting pipelines quarantine bad rows relationally "
    "(v09) instead of dying mid-job. Pure row-local expressions, "
    "whole-stage codegen, zero shuffle",
)
def f17_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(
            F.try_divide("value", (F.col("event_id") % 10).cast("double")), 6
        ).alias("safe_div"),
        F.try_to_number(
            F.when(F.col("event_id") % 3 == 0, "not-a-number").otherwise(
                F.col("event_id").cast("string")
            ),
            F.lit("999999999999"),
        ).cast("bigint").alias("parsed_id"),
        F.expr("try_cast(props AS double)").alias("props_as_num"),
    )


@register(
    "f18_map_functions",
    # Cross-engine comparison of MAP results without relying on either
    # engine's map rendering: every map is canonicalized to a
    # key-sorted "k:v;..." string with values printed as DECIMAL(18,6)
    # (fixed 6-decimal rendering in both engines); the oracle computes
    # the same strings from scalar arithmetic, so the hash match checks
    # Spark's map-HOF semantics against independently derived values.
    oracle="""
    SELECT event_id,
           'h:' || CAST(CAST(hour(ts) AS DOUBLE)/10.0 AS DECIMAL(18,6))
            || ';v:' || CAST(value/10.0 AS DECIMAL(18,6))
            || ';v2:' || CAST((value*2)/10.0 AS DECIMAL(18,6)) AS scaled_entries,
           CONCAT_WS(';',
             CASE WHEN CAST(hour(ts) AS DOUBLE)/10.0 > 1.0
                  THEN 'h:' || CAST(CAST(hour(ts) AS DOUBLE)/10.0 AS DECIMAL(18,6)) END,
             CASE WHEN value/10.0 > 1.0
                  THEN 'v:' || CAST(value/10.0 AS DECIMAL(18,6)) END,
             CASE WHEN (value*2)/10.0 > 1.0
                  THEN 'v2:' || CAST((value*2)/10.0 AS DECIMAL(18,6)) END
           ) AS kept_entries,
           (CAST(hour(ts) AS DOUBLE) - CAST(hour(ts) AS DOUBLE)/10.0)
             + (value - value/10.0)
             + ((value*2) - (value*2)/10.0) AS delta_sum
    FROM events WHERE user_id % 25 = 0
    """,
    doc="f18 (ext.): MAP higher-order functions — create_map, "
    "transform_values, map_filter, map_zip_with, map_entries — the map "
    "half of §2.8's collection surface (f07 covers arrays). All "
    "JVM-side whole-stage codegen, zero shuffle; maps canonicalized to "
    "key-sorted entry strings so the oracle is engine-neutral",
)
def f18_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    m = F.create_map(
        F.lit("h"), F.hour("ts").cast("double"),
        F.lit("v"), F.col("value"),
        F.lit("v2"), F.col("value") * 2,
    )
    scaled = F.transform_values(m, lambda _k, v: v / 10.0)
    kept = F.map_filter(scaled, lambda _k, v: v > 1.0)
    delta = F.map_zip_with(m, scaled, lambda _k, a, b: a - b)

    def canon(mp):
        entries = F.sort_array(F.map_entries(mp))
        return F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(
                    e["key"], F.lit(":"),
                    e["value"].cast("decimal(18,6)").cast("string"),
                ),
            ),
            ";",
        )

    delta_sum = F.aggregate(
        F.map_values(delta), F.lit(0.0), lambda acc, x: acc + x
    )
    return ev.select(
        "event_id",
        canon(scaled).alias("scaled_entries"),
        canon(kept).alias("kept_entries"),
        delta_sum.alias("delta_sum"),
    )


# --- f19 (ext.): URL parsing functions ---------------------------------------


@register(
    "f19_url_functions",
    # The oracle recomputes host/path/param CONSTRUCTIVELY (the URL is
    # built from source/lang/doc_id, so its parts are closed-form) —
    # Spark's parse_url must land on the same decomposition, i.e. the
    # oracle tests the parser against ground truth rather than against
    # another regex.
    oracle="""
    WITH u AS (
      SELECT source || '.example.org' AS host,
             '/' || lang || '/doc-' || CAST(doc_id % 50 AS VARCHAR) AS path,
             doc_id % 7 AS p
      FROM documents
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(SUM(p) AS BIGINT) AS p_sum,
           CAST(MAX(p) AS BIGINT) AS p_max
    FROM u GROUP BY host
    """,
    doc="f19 (ext.): URL parsing — parse_url(HOST/PATH/QUERY param) over "
    "per-doc canonical URLs, rolled up per host (doc count, distinct "
    "paths, query-param aggregates). The JVM-side parser (java.net.URI "
    "semantics) is certified against a constructive oracle that knows "
    "the true decomposition — the provenance/domain-mix audit every "
    "web-scale corpus pipeline runs before source weighting. Scale: "
    "one scan, expressions fused into the aggregate's project; the "
    "host rollup is a map-combined hash agg on a low-cardinality key",
)
def f19_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc-"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&p="),
        (F.col("doc_id") % 7).cast("string"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("p")).cast("long").alias("p"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("path").cast("bigint").alias("n_paths"),
        F.sum("p").cast("bigint").alias("p_sum"),
        F.max("p").cast("bigint").alias("p_max"),
    )


# --- f20 (ext.): timezone conversion functions ---------------------------------

_F20_ZONES = ["America/New_York", "Asia/Kolkata", "Asia/Tokyo"]


@register(
    "f20_timezone_functions",
    # DuckDB twin: timezone('UTC', ts) pins the naive instant as UTC,
    # the outer timezone(zone, ...) renders the zone's wall time —
    # byte-identical to Spark's from_utc_timestamp (both read the IANA
    # tzdb; Kolkata exercises a half-hour offset).
    oracle=f"""
    WITH z AS (
      SELECT unnest(ARRAY{_F20_ZONES!r}) AS zone
    ),
    loc AS (
      SELECT z.zone, e.ts,
             timezone(z.zone, timezone('UTC', e.ts)) AS local_ts
      FROM events e CROSS JOIN z
    )
    SELECT zone,
           CAST(hour(local_ts) AS INT) AS local_hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(date_diff('minute', ts, local_ts)) AS BIGINT)
             AS min_offset_min,
           CAST(MAX(date_diff('minute', ts, local_ts)) AS BIGINT)
             AS max_offset_min
    FROM loc GROUP BY 1, 2
    """,
    doc="f20 (ext.): timezone conversions — from_utc_timestamp across "
    "three IANA zones (incl. a half-hour offset), rolled up as the "
    "local-hour load profile with min/max UTC-offset minutes per zone: "
    "the localization layer a global ops dashboard puts over a "
    "UTC-normalized event store. The zone fanout is an in-row explode "
    "(no join); both engines resolve the same tzdb so wall times are "
    "byte-identical",
)
def f20_timezone_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    zones = F.array(*[F.lit(z) for z in _F20_ZONES])
    loc = ev.select(
        "ts", F.explode(zones).alias("zone")
    ).withColumn("local_ts", F.from_utc_timestamp("ts", F.col("zone")))
    off = (
        (F.unix_timestamp("local_ts") - F.unix_timestamp("ts")) / 60
    ).cast("bigint")
    return loc.groupBy(
        "zone", F.hour("local_ts").cast("int").alias("local_hour")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min(off).alias("min_offset_min"),
        F.max(off).alias("max_offset_min"),
    )


# --- f21 (ext.): binary codec functions ------------------------------------------


@register(
    "f21_binary_codecs",
    # base64 / hex / sha256 over UTF-8 payloads, rolled up per source —
    # the checksum-and-transport surface (webhook signatures, content
    # addressing, manifest digests). Both engines compute the SAME
    # RFC 4648 base64, uppercase-free hex, and FIPS-180 sha256, so the
    # per-source digests hash-match exactly.
    oracle="""
    WITH enc AS (
      SELECT source,
             to_base64(encode(text)) AS b64,
             lower(hex(encode(substr(text, 1, 8)))) AS hx,
             sha256(text) AS sh
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(b64)) AS BIGINT) AS b64_len_sum,
           CAST(SUM(CAST(('0x' || substr(md5(b64), 1, 8)) AS BIGINT))
                AS BIGINT) AS b64_hash_sum,
           CAST(SUM(CAST(('0x' || substr(hx, 1, 8)) AS BIGINT))
                AS BIGINT) AS hex_prefix_sum,
           CAST(SUM(CAST(('0x' || substr(sh, 1, 8)) AS BIGINT))
                AS BIGINT) AS sha_prefix_sum
    FROM enc GROUP BY source
    """,
    doc="f21 (ext.): binary codec surface — base64(UTF-8 payload), hex "
    "of the 8-byte prefix, sha256 digest, rolled up per source with "
    "order-free integer checksums. Completes §2.8's function families "
    "with the transport/content-addressing codecs (manifest digests, "
    "webhook signature verification, cache keys). All JVM-side "
    "whole-stage codegen, one scan, one map-combined aggregate; both "
    "engines implement the same RFC 4648 / FIPS-180 definitions so "
    "every digest is byte-identical",
)
def f21_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    enc = d.select(
        "source",
        # Spark's base64 is MIME-chunked (CRLF every 76 chars); strip to
        # the RFC 4648 canonical form DuckDB's to_base64 emits
        F.regexp_replace(
            F.base64(F.encode("text", "UTF-8")), "\r\n", ""
        ).alias("b64"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "hx"
        ),
        F.sha2("text", 256).alias("sh"),
    )
    h8 = lambda c: F.conv(F.substring(c, 1, 8), 16, 10).cast("long")
    return enc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("b64")).cast("bigint").alias("b64_len_sum"),
        F.sum(h8(F.md5("b64"))).cast("bigint").alias("b64_hash_sum"),
        F.sum(h8(F.col("hx"))).cast("bigint").alias("hex_prefix_sum"),
        F.sum(h8(F.col("sh"))).cast("bigint").alias("sha_prefix_sum"),
    )


# --- f22 (ext.): collation-aware grouping (Spark 4 native collations) ------------------


@register(
    "f22_collation_grouping",
    # Spark 4's native string collations: grouping BY a UTF8_LCASE
    # column merges case variants inside the hash aggregate itself — no
    # derived lower() column, no second projection, and the collation
    # rides the column type through every downstream operator (joins,
    # sorts, distinct). Case variants are planted deterministically
    # (even part keys upper-cased) so the merge is observable; the
    # emitted key is lower()'d because the grouped representative value
    # is otherwise first-encountered (nondeterministic). Oracle: the
    # pre-collation equivalent — GROUP BY lower(nm) — which is exactly
    # the rewrite collations make unnecessary.
    oracle="""
    WITH nm AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                  ELSE p_name END AS nm
      FROM part
    )
    SELECT lower(nm) AS name_ci,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           MIN(nm) AS first_variant
    FROM nm GROUP BY lower(nm)
    """,
    doc="f22 (ext.): collation-aware grouping — part names with planted "
    "case variants grouped under Spark 4's UTF8_LCASE collation: the "
    "case-insensitive merge happens inside the hash aggregate (the "
    "collated comparison is JVM-side, codegen'd), not via a derived "
    "lower() column. At 100 TB the difference is a narrower shuffle "
    "key domain with zero extra projection, and the collation "
    "propagates through joins/sorts as part of the TYPE — the "
    "Spark-native answer to the reference's ad-hoc LOWER() washing in "
    "its dashboard SQL (sql/enhanced_data_schema.sql district "
    "groupings). Exactness: integer counts; MIN over the original "
    "binary-collation strings is engine-identical",
)
def f22_collation_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper("p_name")
        )
        .otherwise(F.col("p_name"))
        .alias("nm")
    )
    return (
        p.groupBy(F.collate("nm", "UTF8_LCASE").alias("nm_ci"))
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.min("nm").alias("first_variant"),
        )
        .select(
            F.lower(F.col("nm_ci")).cast("string").alias("name_ci"),
            "n_parts",
            "first_variant",
        )
    )
