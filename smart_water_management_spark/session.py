"""SparkSession factory with the engine's default configuration.

The defaults reproduce the reference's proven Spark tuning
(reference: src/enhanced_spark_etl.py:40-54 — AQE, partition coalescing,
skew-join handling, Kryo, Arrow, UTC session timezone) and add
local-friendly shuffle sizing. On a real cluster the same config block
applies; only master/memory sizing changes.

Scale posture (100 TB): AQE handles runtime partition coalescing and skew
splitting; ``spark.sql.shuffle.partitions`` here is a local-mode ceiling —
at cluster scale set it to ~2-3× total cores or rely on AQE's initial
partition num.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-planning, partition coalescing, skew joins
    # (reference src/enhanced_spark_etl.py:42-46 keeps all three on).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
    # Kryo + Arrow (reference :47,:49)
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps for oracle comparison (reference :50 uses UTC).
    "spark.sql.session.timeZone": "UTC",
}


def get_session(app_name: str = "smart-water-management-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Honors SPARK_GRAFT_CPUS for local parallelism (driver contract).
    """
    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Per-process warehouse: managed scratch tables (streaming state,
    # bucketed join layouts, CBO stats tables) live under a pid-unique
    # dir, so a concurrent replay/pytest/bench process can never clobber
    # another's state mid-query. Only applies at session creation;
    # externally created sessions (the verification driver's) keep their
    # own warehouse untouched.
    warehouse = os.path.join(tempfile.gettempdir(), f"swm-warehouse-{os.getpid()}")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
