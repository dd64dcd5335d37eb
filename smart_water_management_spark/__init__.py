"""smart_water_management_spark — a PySpark-native analytics engine.

Brand-new engine with the query/data-processing capability surface of the
reference `Tee-works/smart-water-management` (see SURVEY.md), re-expressed
as idiomatic DataFrame/SQL/Catalyst plans plus Structured Streaming, and
extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Importing this package populates the query registry used by
``__spark_entry__.py`` (the correctness driver contract).
"""

from __future__ import annotations

from . import registry
from .session import get_session  # noqa: F401

# Import operator modules for their registration side effects.
from .operators import aggregations  # noqa: F401,E402

_OPTIONAL_MODULES = [
    "smart_water_management_spark.operators.joins",
    "smart_water_management_spark.operators.windows",
    "smart_water_management_spark.operators.relational",
    "smart_water_management_spark.operators.skew",
    "smart_water_management_spark.llmdata.components",
    "smart_water_management_spark.functions.scalar",
    "smart_water_management_spark.functions.udfs",
    "smart_water_management_spark.sources.io_ops",
    "smart_water_management_spark.plans.scd",
    "smart_water_management_spark.plans.mv",
    "smart_water_management_spark.plans.pipeline",
    "smart_water_management_spark.streaming.ingest",
    "smart_water_management_spark.plans.dashboard",
    "smart_water_management_spark.plans.star_schema",
    "smart_water_management_spark.validation.checks",
    "smart_water_management_spark.streaming.batch_windows",
    "smart_water_management_spark.streaming.jobs",
    "smart_water_management_spark.ml.analytics",
    "smart_water_management_spark.llmdata.dedup",
    "smart_water_management_spark.llmdata.similarity",
    "smart_water_management_spark.llmdata.text",
    "smart_water_management_spark.llmdata.multimodal",
    "smart_water_management_spark.llmdata.curation",
]

import importlib as _importlib

# Names of optional modules that failed to import this process — consumed
# by driver_window to distinguish "target's module absent" (skip the
# alias) from "typo'd target" (fail fast).
_FAILED_OPTIONAL: list[str] = []

for _m in _OPTIONAL_MODULES:
    try:
        _importlib.import_module(_m)
    except ModuleNotFoundError:
        _FAILED_OPTIONAL.append(_m)  # module not built yet; registry stays partial

# Last: driver-window aliases (must see every natural registration above).
from . import driver_window  # noqa: F401,E402

queries = registry.all_queries
oracle_sql = registry.all_oracles
