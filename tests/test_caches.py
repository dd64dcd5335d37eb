"""Driver-side cache hygiene: the table/plan caches in sources.catalog and
the prepared-statement memo in plans.dashboard must stay bounded and must
actually empty when a caller clears them (VERDICT r5 ADVICE items)."""

from __future__ import annotations

from smart_water_management_spark.plans import dashboard
from smart_water_management_spark.sources import catalog


def test_clear_table_cache_evicts_plan_cache_too(spark):
    """clear_table_cache is the 'rescan fresh layout' hook used before the
    physical-plan assertions; under the non-small posture scans memoize in
    _PLAN_CACHE (not _TABLE_CACHE), so clearing must cover both or a
    rewritten table dir keeps serving the stale resolved file index."""
    key = (catalog.session_key(spark), "/root/testdata/sf0.001", "region")
    catalog._PLAN_CACHE[key] = catalog._read_table(
        spark, "/root/testdata/sf0.001", "region"
    )
    catalog.clear_table_cache(spark)
    assert key not in catalog._PLAN_CACHE
    assert not [k for k in catalog._TABLE_CACHE if k[0] == key[0]]


def test_plan_memo_is_lru_bounded(spark):
    """The dashboard prepared-statement memo is keyed by raw SQL text; a
    session issuing varied ad-hoc SQL must not grow it without limit."""
    dashboard._PLAN_MEMO.clear()
    for i in range(dashboard._PLAN_MEMO_MAX + 32):
        dashboard._sql(
            spark, "/root/testdata/sf0.001", f"SELECT {i} AS v", tables=[]
        )
    assert len(dashboard._PLAN_MEMO) == dashboard._PLAN_MEMO_MAX
    # Most-recent entries survive; the earliest were evicted first.
    sqls = {k[2] for k in dashboard._PLAN_MEMO}
    assert f"SELECT {dashboard._PLAN_MEMO_MAX + 31} AS v" in sqls
    assert "SELECT 0 AS v" not in sqls
    dashboard._PLAN_MEMO.clear()


def test_pin_derived_budget_evicts_lru(spark, monkeypatch):
    """VERDICT r11 item 3: derived pins must be bytes-budgeted with LRU
    eviction — a session replaying the full registry pins LSH signatures,
    component tables, band tables and PQ codes, and an unbounded registry
    would be a 100 TB scale risk. Under a 1-byte budget every OLDER pin
    must be evicted (unpersisted + dropped) as soon as a newer
    materialized pin exceeds the budget, while the requested pin itself
    always survives its own call."""
    monkeypatch.setenv("SWM_PIN_BUDGET_BYTES", "1")
    sess = catalog.session_key(spark)
    try:
        a = catalog.pin_derived(
            spark, "/budget-test", "pin_a",
            lambda: spark.range(10_000).selectExpr("id", "id * 2 AS v"),
        )
        a.count()  # materialize: pin_a now holds blocks > 1 byte
        key_a = (sess, "/budget-test", "derived:pin_a")
        assert key_a in catalog._TABLE_CACHE
        b = catalog.pin_derived(
            spark, "/budget-test", "pin_b",
            lambda: spark.range(10_000).selectExpr("id", "id * 3 AS v"),
        )
        # pin_a (LRU, materialized, over budget) was evicted; pin_b — the
        # pin just requested — is never its own victim.
        assert key_a not in catalog._TABLE_CACHE
        assert (sess, "/budget-test", "derived:pin_b") in catalog._TABLE_CACHE
        assert a.storageLevel.useMemory is False  # really unpersisted
        b.count()
        # a later unrelated pin call now evicts the materialized pin_b too
        catalog.pin_derived(
            spark, "/budget-test", "pin_c", lambda: spark.range(10)
        )
        assert (sess, "/budget-test", "derived:pin_b") not in catalog._TABLE_CACHE
    finally:
        catalog.clear_table_cache(spark)


def test_plan_cache_is_lru_bounded(spark, monkeypatch):
    """_PLAN_CACHE is keyed by (session, sf_dir, table); many tables/dirs in
    one long-lived driver must not accumulate analyzed plans without limit.
    Exercises the real load_table population path under the production
    posture (the branch that memoizes plans instead of persisting)."""
    from smart_water_management_spark import registry

    catalog._PLAN_CACHE.clear()
    monkeypatch.setattr(catalog, "_PLAN_CACHE_MAX", 4)
    registry.set_posture("production")
    try:
        for name in ["region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem"]:
            catalog.load_table(spark, "/root/testdata/sf0.001", name)
        assert len(catalog._PLAN_CACHE) == 4
        # LRU: the most recently loaded tables survive.
        kept = {k[2] for k in catalog._PLAN_CACHE}
        assert kept == {"part", "orders", "lineitem", "supplier"}
    finally:
        registry.set_posture("auto")
        catalog._PLAN_CACHE.clear()


def test_fan_out_guard_without_rdd_at_scale(spark):
    """r12 (VERDICT r11 item 4): fan_out must (a) still fan a one-file
    local scan to the session's core count, (b) still no-op on an
    already-fanned frame (the exact-partition fallback), and (c) make
    the at-scale no-op decision from the resolved file index — a frame
    with more input files than target/min_factor returns unchanged
    (identity), which never needs the plan-to-RDD conversion."""
    d = catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
    target = spark.sparkContext.defaultParallelism
    fanned = catalog.fan_out(d, spark)
    assert fanned.rdd.getNumPartitions() == target
    assert catalog.fan_out(fanned, spark) is fanned  # no double repartition
    # many-files scale posture: identity without consulting df.rdd
    many = d
    real_input_files = type(d).inputFiles
    try:
        type(d).inputFiles = lambda self: [f"f{i}" for i in range(target)]
        assert catalog.fan_out(many, spark) is many
    finally:
        type(d).inputFiles = real_input_files


def test_q13_rides_prepared_statement_memo(spark):
    """r12 (VERDICT r11 #6): q13 was the one dashboard query outside the
    prepared-statement memo (~87 ms of view re-registration + re-parse
    per call). Repeated invocations must now return the SAME memoized
    DataFrame object, and its analytical view must exist."""
    from smart_water_management_spark.plans.dashboard import q13

    a = q13(spark, "/root/testdata/sf0.001")
    b = q13(spark, "/root/testdata/sf0.001")
    assert a is b
    assert spark.catalog.tableExists("v_district_performance")
    assert a.count() > 0
