"""SparkSession construction with scale-oriented defaults.

The reference configures its runtime in ``config/FlinkConfig.scala:27-72``
(parallelism 120, exactly-once checkpointing, restart strategies). The Spark
equivalents are declarative session confs: AQE replaces hand-tuned
parallelism, ``spark.sql.shuffle.partitions`` replaces ``flink.parallelism``,
and checkpointing is per-``writeStream`` (see streaming/).

Everything here is safe on a real cluster: we only set logical-plan and
shuffle knobs, never hardware assumptions. On a 1000-executor cluster the
same code runs with ``--conf spark.sql.shuffle.partitions=2000`` etc. from
spark-submit; builder confs act as defaults only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session timezone is pinned to UTC so that epoch extraction from the
# driver's naive parquet timestamps matches DuckDB's (naive) interpretation.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join splitting, dynamic join selection.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Parquet scan sizing; 128 MiB splits are the right default for both
    # local[32] and a large cluster.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # The driver's events.parquet stores TIMESTAMP(NANOS), which Spark has
    # no native type for; read as epoch-nanos LongType and convert to
    # micros-truncated TimestampType in the table registry (DuckDB's own
    # TIMESTAMP type truncates ns→us the same way).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive parquet TIMESTAMP(MICROS) (current testdata) reads as
    # TimestampType, not TIMESTAMP_NTZ — with the UTC session tz this is
    # value-identical to DuckDB's naive interpretation, and keeps
    # unix_micros()/withWatermark() working on the ts column.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Timely ContextCleaner reclamation of dead localCheckpoint blocks
    # (operators/mat.py pins): the 30-minute default lets blocks from
    # dozens of finished queries pile up in one long-lived session
    # (observed as a broadcast-build OOM at the r15 bench close). 2
    # minutes is cheap (one System.gc on the driver) and applies to every
    # entrypoint — bench, driver replica, perf tools — not just bench.py
    # (ADVICE r15 #3).
    "spark.cleaner.periodicGC.interval": "2min",
    # Shuffle compression etc. are already-sane defaults; we leave them.
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "flink-realtime-sessionize-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the test
    environment); on a cluster, spark-submit's ``--master`` wins because an
    active session is reused as-is.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
