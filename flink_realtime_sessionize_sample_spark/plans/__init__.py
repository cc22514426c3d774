"""Query plans: the driver-facing registry of (PySpark query, DuckDB oracle SQL) pairs.

Importing this package imports every query module, which registers its
queries as a side effect of the ``@query`` decorators.
"""

from flink_realtime_sessionize_sample_spark.plans.registry import QUERIES, ORACLES, query

# Registration imports (order = SURVEY.md §7 build phases).
from flink_realtime_sessionize_sample_spark.plans import sessionize_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import relational_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import llm_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import coverage_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import temporal_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import pipeline_queries  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "query"]
