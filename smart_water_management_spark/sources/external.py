"""External connectors (SURVEY.md §2.1 S3/S7/S8/S9/S10).

The reference reads CSVs from S3 via boto3+pandas (`src/etl.py:25-34`),
writes silver/gold CSVs back (`src/etl.py:36-50`), loads PostgreSQL over
SQLAlchemy row batches (`src/warehouse_loader.py:250-292`), reads it back
per dashboard query (`src/app.py:26-45`), and polls three REST APIs
(`src/enhanced_ingestion.py:139-431`). In this engine each becomes the
native Spark connector — object-store paths on `spark.read`/`write`
(Hadoop s3a), `spark.read.jdbc`/`DataFrameWriter.jdbc` with pushed
predicates and partitioned reads, and a foreachBatch polling source
guarded by the resilience layer (`streaming.ingest`).

No object store, database server, or network exists in the build/test
environment, so CI exercises each connector to the deepest reachable
boundary: the object-store read/write run against ``file://`` (the same
Hadoop FileSystem path as ``s3a://``, differing only in the scheme the
cluster conf binds — tests/test_pipeline_ingest.py), and the polling
source runs as a real streaming query with an injected fetch callable,
covering everything but the HTTP call itself (tests/test_streaming.py).
The JDBC pair round-trips through embedded Apache Derby in CI (the
in-process database that ships in Spark's jars/ —
tests/test_pipeline_ingest.py::test_jdbc_warehouse_roundtrip_embedded_derby
covers sink append, full read, partitioned parallel read with fetched
bounds, and pushed predicates); a real warehouse swaps the URL/driver.
Import is side-effect-free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..streaming.ingest import CircuitBreaker, RateLimiter, SourceHealth, resilient_call


def read_object_store_csv(
    spark: SparkSession, path: str, schema=None, **options
) -> DataFrame:
    """S3: CSV scan from an object store (s3a://bucket/key...).

    Replaces the reference's boto3 get_object + pd.read_csv
    (src/etl.py:25-34) with a distributed scan: every executor reads its
    own byte ranges; no driver materialization. Credentials/endpoint come
    from the cluster's Hadoop conf (spark.hadoop.fs.s3a.*).
    """
    reader = spark.read.option("header", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_object_store_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet", **options
) -> None:
    """S7: silver/gold sink to the object store with hive-style partition
    directories (reference writes year=/month=/day= CSV paths by hand,
    src/etl.py:186-203; partitionBy produces the same layout natively)."""
    writer = df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


# Identifier quoting per JDBC dialect: Spark's JDBC writer creates
# case-exact quoted identifiers, so raw SQL we compose against those
# tables must quote with the ENGINE's quote style — ANSI double quotes
# (Derby/PostgreSQL/Oracle), backticks (MySQL/MariaDB), or brackets
# (SQL Server).
_DIALECT_QUOTES: dict[str, tuple[str, str]] = {
    "jdbc:mysql": ("`", "`"),
    "jdbc:mariadb": ("`", "`"),
    "jdbc:sqlserver": ("[", "]"),
}


def _quotes_for(url: str, quote_char: str | None) -> tuple[str, str]:
    if quote_char is not None:
        return ("[", "]") if quote_char == "[" else (quote_char, quote_char)
    for prefix, quotes in _DIALECT_QUOTES.items():
        if url.startswith(prefix):
            return quotes
    return ('"', '"')


def _quote_ident(name: str, quotes: tuple[str, str]) -> str:
    """Quote a (possibly schema-qualified) identifier; leave anything
    already quoted or non-trivial (subquery, spaces) untouched."""
    lo, hi = quotes
    if lo in name or "(" in name or " " in name:
        return name
    return ".".join(f"{lo}{part}{hi}" for part in name.split("."))


def read_warehouse_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
    quote_char: str | None = None,
    quote_table: bool = False,
    **properties,
) -> DataFrame:
    """S9: JDBC source with partitioned parallel reads.

    The reference's pd.read_sql (src/app.py:26-45) pulls the whole result
    through one connection; spark.read.jdbc with partitionColumn bounds
    splits the table across ``num_partitions`` concurrent cursors, and a
    pushed predicate ships the WHERE clause to the database.

    ``quote_char`` overrides the identifier quote style for the composed
    bounds/predicate SQL (default: derived from the JDBC URL — backticks
    for MySQL/MariaDB, brackets for SQL Server, ANSI double quotes
    otherwise). Columns are always quoted (Spark's JDBC writer creates
    case-exact quoted column names); the TABLE name is quoted only with
    ``quote_table=True`` — the writer leaves table names unquoted, so
    engines like Derby store them case-normalized and a quoted lookup
    would miss them.
    """
    quotes = _quotes_for(url, quote_char)
    qtable = _quote_ident(table, quotes) if quote_table else table
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option(
            "dbtable",
            f"(SELECT * FROM {qtable} WHERE {predicate}) t" if predicate else table,
        )
    )
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        qcol = _quote_ident(partition_column, quotes)
        bounds = spark.read.format("jdbc").option("url", url).option(
            "dbtable", f"(SELECT MIN({qcol}) lo, MAX({qcol}) hi FROM {qtable}) b"
        )
        for k, v in properties.items():
            bounds = bounds.option(k, v)
        # positional access: engines normalize unquoted alias case
        # differently (Derby uppercases LO/HI)
        row = bounds.load().collect()[0]
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(row[0]))
            .option("upperBound", str(row[1]))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_warehouse_table(
    df: DataFrame, url: str, table: str, mode: str = "append", **properties
) -> None:
    """S8: JDBC sink — set-based append replacing the reference's
    1000-row SQLAlchemy batches (src/warehouse_loader.py:250-292); each
    partition writes over its own connection."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def polling_source(
    spark: SparkSession,
    fetch: Callable[[], list[dict]],
    schema: str,
    sink_path: str,
    checkpoint: str,
    poll_seconds: int = 600,
    breaker: CircuitBreaker | None = None,
    limiter: RateLimiter | None = None,
):
    """S10/T1: REST polling as a Structured Streaming job.

    A rate-source tick triggers each poll; ``fetch`` (the API call) runs
    driver-side inside foreachBatch under the circuit breaker / rate
    limiter (reference src/enhanced_ingestion.py:99-137,264-269), and the
    rows it returns are parallelized, lineage-stamped, and appended to
    the bronze sink. Returns the StreamingQuery handle.
    """
    from . import catalog  # noqa: F401  (bronze layout helpers)
    from ..streaming.ingest import stamp_lineage

    breaker = breaker or CircuitBreaker()
    health = SourceHealth("polling-source")

    def poll(_batch_df: DataFrame, batch_id: int) -> None:
        try:
            rows = resilient_call(breaker, limiter, health, fetch)
        except Exception:
            # a transient fetch failure must not kill the streaming query —
            # the breaker has recorded it (and opens at the threshold); the
            # poller skips this tick exactly like the reference's loop
            # (src/enhanced_ingestion.py:270-276 logs and continues)
            return
        if not rows:
            return  # breaker open or empty poll: skip this tick
        batch = spark.createDataFrame(rows, schema)
        stamp_lineage(batch, batch_id).write.mode("append").parquet(sink_path)

    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    return (
        ticks.writeStream.foreachBatch(poll)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{poll_seconds} seconds")
        .start()
    )
