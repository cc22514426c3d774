"""flink_realtime_sessionize_sample_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured Streaming)
engine with the query and data-processing capabilities of the reference
project ``visualskyrim/flink-realtime-sessionize-sample`` (a Flink 1.12
stateful per-key sessionization job), extended with the relational operator
surface (joins, aggregations, window functions, set ops, scalar functions)
and the LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing) that a 100 TB training-data pipeline
needs.

Design stance (see SURVEY.md §7):

* Batch DataFrame pipeline is the source of truth for semantics — every
  operator is expressed declaratively so Catalyst handles pushdown, pruning
  and join planning; physical tuning is limited to partitioning hints,
  broadcasts and AQE.
* Structured Streaming reuses identical column expressions plus one
  stateful operator (``applyInPandasWithState``) for the reference's
  per-event emission semantics.
* Python UDFs only where the built-in functions genuinely cannot express
  the semantics (the capped-sessionization refinement path and streaming
  state), always Arrow-batched, never row-at-a-time.
"""

from flink_realtime_sessionize_sample_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
