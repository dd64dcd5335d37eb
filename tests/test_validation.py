"""Validator behavior on data with injected violations (SURVEY §5.2.3):
exact failure counts, quarantine split, weighted score."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from smart_water_management_spark.validation.checks import (
    EVENTS_RULES,
    quarantine,
    validate,
    weighted_score,
)


def _dirty_df(spark):
    ts = datetime.datetime(2024, 1, 5, 12, 0, 0)
    future = datetime.datetime(2030, 1, 1, 0, 0, 0)
    rows = [
        # clean rows
        (1, ts, 10, "click", 5.0, '{"k": 1}'),
        (2, ts, 11, "view", 499.0, '{"k": 2}'),
        # value out of range (2 rows)
        (3, ts, 12, "click", -1.0, '{"k": 3}'),
        (4, ts, 12, "click", 1000.0, '{"k": 4}'),
        # bad enum
        (5, ts, 13, "hover", 5.0, '{"k": 5}'),
        # bad props format
        (6, ts, 14, "click", 5.0, "not-json"),
        # future timestamp
        (7, future, 15, "click", 5.0, '{"k": 7}'),
        # null value
        (8, ts, 16, "click", None, '{"k": 8}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_exact_failure_counts(spark):
    report = validate(_dirty_df(spark), EVENTS_RULES).collect()
    counts = {r.rule_name: r.failed_count for r in report}
    assert counts["value_range"] == 2
    assert counts["type_enum"] == 1
    assert counts["props_json_format"] == 1
    assert counts["ts_not_future"] == 1
    assert counts["value_not_null"] == 1
    assert counts["ts_not_null"] == 0
    assert all(r.total_rows == 8 for r in report)


def test_quarantine_split(spark):
    clean, bad = quarantine(_dirty_df(spark), EVENTS_RULES)
    assert clean.count() == 2
    bad_rows = {r.event_id: set(r.violated_rules) for r in bad.collect()}
    assert bad_rows[3] == {"value_range"}
    assert bad_rows[5] == {"type_enum"}
    assert bad_rows[7] == {"ts_not_future"}
    assert bad_rows[8] == {"value_not_null"}


def test_weighted_score_status(spark):
    row = weighted_score(_dirty_df(spark), EVENTS_RULES).collect()[0]
    assert 0.0 < row.overall_score < 1.0
    assert row.status in ("PASS", "WARNING", "FAIL")
    # 6/8 rules clean-ish → score should be high-but-not-perfect
    assert row.overall_score > 0.8


def test_scd2_merge(spark):
    from smart_water_management_spark.plans.scd import scd2_merge

    dim = spark.createDataFrame(
        [
            (1, "north", datetime.date(2024, 1, 1), None, True),
            (2, "south", datetime.date(2024, 1, 1), None, True),
        ],
        "sensor_id long, district string, effective_date date, end_date date, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "east"), (3, "west")], "sensor_id long, district string"
    )
    merged = scd2_merge(
        dim, updates, key="sensor_id", tracked=["district"], change_date="2024-01-15"
    )
    rows = {(r.sensor_id, r.district, r.is_current) for r in merged.collect()}
    # sensor 1: old row closed + new current row; sensor 2 untouched; sensor 3 inserted
    assert (1, "north", False) in rows
    assert (1, "east", True) in rows
    assert (2, "south", True) in rows
    assert (3, "west", True) in rows
    assert merged.count() == 4
