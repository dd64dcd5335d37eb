"""Table catalog over the driver's parquet testdata.

Mirrors the reference's source surface (SURVEY.md §2.1): explicit-schema
scans, partitioned parquet sinks, and view registration so the dashboard
SQL layer (§2.14) can run via ``spark.sql``. Parquet scans get predicate
pushdown + column pruning from Catalyst for free; at 100 TB the same reads
hit hive-partitioned directories and prune on year/month/day.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Shared-scan cache for the small-input posture: a correctness sweep or
# benchmark suite runs hundreds of queries over the same ten MB-scale
# tables, and re-decoding parquet per query is pure repeat cost when the
# whole dataset fits in a fraction of executor memory. Entries are lazy
# (`persist()` — materialized by each table's first action). Production
# posture bypasses this entirely: at 100 TB you stream the scan, prune
# columns/partitions, and never pin base tables.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# Plan-level memo used at EVERY posture: maps (session, sf_dir, table) to
# the analyzed scan DataFrame. Unlike _TABLE_CACHE this never persists —
# it only reuses the resolved file index + parquet footer schema, the same
# thing a metastore catalog table provides, so repeated queries (a
# dashboard refresh loop, a bench pass) skip ~80 ms of driver-side file
# listing per table per call. Data still streams through the scan. The
# testdata directories are read-only for the engine, so the resolved file
# index cannot go stale mid-session (clear_table_cache evicts it anyway
# for callers that rewrite a dir they previously scanned). LRU-bounded:
# keys are (session, sf_dir, table), so a long-lived driver touching many
# sf_dirs would otherwise accumulate analyzed plans without limit.
_PLAN_CACHE: "OrderedDict[tuple[str, str, str], DataFrame]" = OrderedDict()
_PLAN_CACHE_MAX = 256


def session_key(spark: SparkSession) -> str:
    """Stable identity for cache keys. NOT id(spark): CPython reuses
    object addresses, so a new session can alias a stopped one's cache
    entries (whose lineage points at a dead SparkContext); the
    applicationId is unique per context."""
    return spark.sparkContext.applicationId


def normalize_event_ts(df: DataFrame):
    """Column expression that yields ``ts`` as a session-tz TIMESTAMP
    regardless of the parquet physical type the generator used.

    TIMESTAMP(NANOS) files only reach Spark as epoch-nanos longs (legacy
    flag) and need integer ``div`` back to the microsecond grid (a double
    division would lose precision above 2^53); TIMESTAMP(MICROS) files
    arrive as TIMESTAMP_NTZ and only need the LTZ cast (identity under the
    engine's UTC session timezone) so every downstream query sees one dtype.
    """
    dtype = dict(df.dtypes)["ts"]
    if dtype == "bigint":
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", normalize_event_ts(df)).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one testdata table.

    Parquet carries its own schema; Catalyst prunes columns and pushes
    filters into the scan (equivalent of reference src/spark_etl.py:47-64's
    explicit-schema CSV read, upgraded to a columnar format).

    ``events.ts`` is stored as TIMESTAMP(NANOS), which the Spark parquet
    reader rejects; we read it as epoch-nanos long (legacy flag) and
    convert with integer division (``div`` — a double division would lose
    precision above 2^53) back to a microsecond timestamp. The testdata's
    ts values all sit on the microsecond grid, so this is lossless.
    """
    from ..registry import small_input

    _evict_dead_entries()
    key = (session_key(spark), sf_dir, name)
    if not small_input(sf_dir):
        if key not in _PLAN_CACHE:
            _PLAN_CACHE[key] = _read_table(spark, sf_dir, name)
            while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
                _PLAN_CACHE.popitem(last=False)
        else:
            _PLAN_CACHE.move_to_end(key)
        return _PLAN_CACHE[key]
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = _read_table(spark, sf_dir, name).persist()
    return _TABLE_CACHE[key]


def _evict_dead_entries() -> None:
    """Drop cached scans whose SparkContext has been stopped — their
    persisted blocks died with the context, and a long-lived driver that
    cycles sessions would otherwise accumulate dead entries forever
    (clear_table_cache only covers the CURRENT session's keys)."""
    from ..registry import session_is_stopped

    for key in [k for k, df in _TABLE_CACHE.items()
                if session_is_stopped(df.sparkSession)]:
        _TABLE_CACHE.pop(key)
        _PIN_LRU.pop(key, None)
    for key in [k for k, df in _PLAN_CACHE.items()
                if session_is_stopped(df.sparkSession)]:
        _PLAN_CACHE.pop(key)


# LRU order of the derived pins (pin_derived) — least-recently-used first.
# Governs ONLY derived pins; base-table scans under the small-input posture
# are a fixed, bounded set (the ten MB-scale testdata tables) and are not
# evicted by the budget.
_PIN_LRU: "OrderedDict[tuple[str, str, str], None]" = OrderedDict()


def _pin_budget_bytes() -> int:
    """Session pin budget (VERDICT r11 item 3: pins accumulated per session
    with no cap — fine at sf0.1 in a 16 GB driver, a scale risk at 100 TB).
    Scale-parameterised via env with a local default sized to the sandbox;
    production deployments set it to a fraction of executor storage memory."""
    import os

    return int(os.environ.get("SWM_PIN_BUDGET_BYTES", str(4 * 1024**3)))


def _cached_bytes(spark: SparkSession) -> int:
    """Total bytes currently materialized in the block manager (memory +
    disk) across all persisted RDDs/DataFrames of this session. Lazy pins
    that have not run an action yet report 0 — they hold no blocks."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def _enforce_pin_budget(spark: SparkSession, keep) -> None:
    """Evict least-recently-used derived pins until the session's
    materialized cache fits the budget (never the pin just requested).
    Eviction is safe: a pinned frame is a pure function of the parquet
    inputs, so consumers recompute on next use — the budget trades repeat
    compute for bounded memory, exactly the 100 TB posture."""
    budget = _pin_budget_bytes()
    sess = session_key(spark)
    while _cached_bytes(spark) > budget:
        victim = next(
            (k for k in _PIN_LRU if k[0] == sess and k != keep), None
        )
        if victim is None:
            break  # nothing evictable left (base scans are not governed)
        _PIN_LRU.pop(victim)
        df = _TABLE_CACHE.pop(victim, None)
        if df is not None:
            df.unpersist()


def pin_derived(
    spark: SparkSession, sf_dir: str, name: str, build, storage_level=None
) -> DataFrame:
    """Persist-and-track a derived table (e.g. an exploded n-gram table
    consumed by both sides of a self-join). Registering the pin here —
    instead of a bare ``.persist()`` at the call site — means repeated
    invocations reuse ONE cached copy rather than pinning a fresh one per
    sweep, and ``clear_table_cache`` / dead-session eviction release it.

    r12: pins are budgeted (``SWM_PIN_BUDGET_BYTES``, default 4 GiB) with
    LRU eviction across the session's derived pins, and callers may pass
    an explicit ``storage_level`` (default MEMORY_AND_DISK via
    ``persist()`` — spills instead of OOMing when a pin outgrows memory).
    The budget check runs on each pin call against the block manager's
    real materialized bytes; a lazy pin costs nothing until its first
    action, so enforcement naturally follows materialization order."""
    _evict_dead_entries()
    key = (session_key(spark), sf_dir, f"derived:{name}")
    if key not in _TABLE_CACHE:
        built = build()
        _TABLE_CACHE[key] = (
            built.persist(storage_level) if storage_level else built.persist()
        )
        _PIN_LRU[key] = None
        _enforce_pin_budget(spark, keep=key)
    elif key in _PIN_LRU:
        _PIN_LRU.move_to_end(key)
    return _TABLE_CACHE[key]


def clear_table_cache(spark: SparkSession) -> None:
    """Unpersist and forget every shared-scan cache entry.

    Needed before plan inspection under the production posture: Spark's
    CacheManager substitutes InMemoryRelation into ANY plan that matches
    a cached fragment, so a lingering cached scan would hide the
    pushdown/pruning behavior the physical-plan CI asserts. Also evicts
    the session's memoized analyzed scans (_PLAN_CACHE, the non-small
    posture path) so a "cleared" session re-resolves the file index —
    without this, a table dir rewritten after first load would keep
    serving the stale resolved listing."""
    for key in [k for k in _TABLE_CACHE if k[0] == session_key(spark)]:
        _TABLE_CACHE.pop(key).unpersist()
        _PIN_LRU.pop(key, None)
    for key in [k for k in _PLAN_CACHE if k[0] == session_key(spark)]:
        _PLAN_CACHE.pop(key)


def literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small constant table as a JVM-local relation, not a Python RDD.

    ``spark.createDataFrame(list, ...)`` plans as ``Scan ExistingRDD``: a
    Python-RDD-backed scan that re-pickles the rows through Python worker
    tasks on EVERY action consuming it — and parallelize() fans a 10-row
    list into defaultParallelism near-empty tasks, so on local[32] each
    evaluation pays ~32 Python round trips (measured 0.35 s vs 0.04 s
    noop for a 10-row LUT table; optimization guide §4.1: eliminate the
    Python boundary). Routing the same rows through a pandas DataFrame
    ships them to the JVM ONCE as Arrow batches and plans as
    ``LocalTableScan`` — a true LocalRelation with no per-action Python
    work. (An all-literal expression tree was measured as the worse
    alternative: thousands of Literal nodes re-enter analysis on every
    action — x65's 2.5k-double LUT went 1.5 s -> 9.6 s.) Values are
    byte-identical to the createDataFrame result: int64/float64 pandas
    cells round-trip Python ints/floats exactly. Falls back to the row
    path automatically when Arrow conversion is disabled (slower, same
    values). Use for bounded fixture/metadata tables (rules, probe
    grids, LUTs, driver-computed result rows) — not for real data."""
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    if not rows:
        return spark.createDataFrame([], st)
    import pandas as pd

    pdf = pd.DataFrame.from_records(
        list(rows), columns=[f.name for f in st.fields]
    )
    return spark.createDataFrame(pdf, st)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink (reference src/enhanced_spark_etl.py:777-782).

    Directory partitioning by low-cardinality time columns is what replaces
    the reference warehouse's range partitioning + btree indexes at scale:
    readers prune partitions and use parquet min/max stats.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_compacted_parquet(df: DataFrame, path: str, n_files: int = 1) -> None:
    """Small-file-compaction sink (reference src/spark_etl.py:241)."""
    df.coalesce(n_files).write.mode("overwrite").parquet(path)


def read_csv_with_schema(spark: SparkSession, path: str, schema) -> DataFrame:
    """Header CSV with explicit schema — no inference pass
    (reference src/spark_etl.py:47-64)."""
    return (
        spark.read.option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .schema(schema)
        .csv(path)
    )


def fan_out(df: DataFrame, spark: SparkSession, min_factor: int = 2) -> DataFrame:
    """Repartition a narrow scan up to the session's core count.

    Small parquet files (e.g. the documents table locally) arrive as ONE
    input split, which serializes downstream explode/hash-heavy operators
    on a single core. At 100 TB inputs already carry thousands of splits
    and this is a no-op (the partition count check keeps it shuffle-free).

    r12 (VERDICT r11 item 4): the no-op decision at scale is made from
    ``df.inputFiles()`` — the already-resolved file index — WITHOUT
    touching ``df.rdd``, which instantiates the full plan-to-RDD
    conversion on the driver per invocation (fan_out has ~60 call sites,
    each constructed per query). The file count is a lower bound on the
    scan's split count, so ``len(files) * min_factor > target`` implies
    the old partition-count guard would also have no-opped. Only when a
    repartition is still plausible (few files: the local posture, or a
    bounded derived frame) is the exact partition count consulted, which
    keeps every decision identical to the old guard on frames that are
    already fanned out (e.g. a helper applied to a pre-fanned input).
    """
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) * min_factor > target:
        return df  # already many splits — scale posture, no RDD conversion
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df


def warehouse_path(spark: SparkSession) -> str:
    """Local filesystem path of the session warehouse dir (managed tables).

    Local-mode only: strips the file: scheme. A remote warehouse
    (hdfs://, s3a://) needs the Hadoop FileSystem API instead — callers
    of reset_managed_table rebuild per-run scratch tables, a local-mode
    concern by construction.
    """
    raw = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return raw.removeprefix("file://").removeprefix("file:")


def reset_managed_table(spark: SparkSession, name: str) -> None:
    """Drop a managed table AND its location.

    An interrupted earlier session can leave the data directory behind
    without its catalog entry, in which case a later saveAsTable fails
    with LOCATION_ALREADY_EXISTS — so the directory is removed even when
    the catalog has never heard of the table.
    """
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(os.path.join(warehouse_path(spark), name), ignore_errors=True)
