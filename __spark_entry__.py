"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (grok-parse the transcript payload
derived from events, then the per-endpoint performance report — the
reference's ``database.py:322-363`` / ``performance.py:60-74`` semantics).

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB oracle over the shared parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_analysis_system_spark.queries_log import ORACLES as _LOG_ORACLES
from log_analysis_system_spark.queries_log import QUERIES as _LOG_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _LOG_QUERIES["endpoint_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_LOG_QUERIES)
    try:
        from log_analysis_system_spark.queries_data import QUERIES as _DATA_QUERIES

        out.update(_DATA_QUERIES)
    except ImportError:
        pass
    try:
        from log_analysis_system_spark.queries_events import QUERIES as _EVENT_QUERIES

        out.update(_EVENT_QUERIES)
    except ImportError:
        pass
    try:
        from log_analysis_system_spark.queries_tpch import QUERIES as _TPCH_QUERIES

        out.update(_TPCH_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_LOG_ORACLES)
    try:
        from log_analysis_system_spark.queries_data import ORACLES as _DATA_ORACLES

        out.update(_DATA_ORACLES)
    except ImportError:
        pass
    try:
        from log_analysis_system_spark.queries_events import ORACLES as _EVENT_ORACLES

        out.update(_EVENT_ORACLES)
    except ImportError:
        pass
    try:
        from log_analysis_system_spark.queries_tpch import ORACLES as _TPCH_ORACLES

        out.update(_TPCH_ORACLES)
    except ImportError:
        pass
    return out
