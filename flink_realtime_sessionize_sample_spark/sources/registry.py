"""Table registry over the driver-generated parquet test data.

The reference reads exactly one input shape — UTF-8 access-log lines from
Kafka or a local file (``RealtimeSessionize.scala:92-113``). The rebuild is
schema-on-read over columnar parquet: every query takes an ``sf_dir`` and
loads what it needs, so Catalyst gets predicate pushdown and column pruning
against the parquet scans for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
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
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Timestamp normalization, applied uniformly so column types never
    # depend on table-load order within a session: events.ts arrived as
    # parquet TIMESTAMP(NANOS) in earlier testdata generations (Spark has no
    # nanos type and refuses the file unless nanos surface as LongType) and
    # as naive TIMESTAMP(MICROS) in the current one (which Spark would
    # otherwise infer as TIMESTAMP_NTZ — a type ``unix_micros``/watermarks
    # reject). Both confs are runtime-set so they hold even under a
    # caller-provided SparkSession (the driver builds its own). Session tz
    # is pinned UTC, so reading naive micros as TimestampType(LTZ) is
    # exactly DuckDB's interpretation of the same values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Pin UTC even under a caller-provided session: naive parquet micros
    # read as LTZ are then value-identical to DuckDB's naive interpretation
    # in every tz-dependent expression (date_trunc, casts, formatting).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # Defensive: schema captured before the conf took effect.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos LongType.
    # Truncate to micros (exactly DuckDB's ns→us behavior) and restore a real
    # TimestampType so downstream event-time logic is type-native.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        cols = [
            # integer `div` keeps the math in exact long arithmetic (epoch
            # nanos exceed double's 2^53 mantissa)
            F.timestamp_micros(F.expr(f"{c} div 1000")).alias(c) if c == "ts" else F.col(c)
            for c in df.columns
        ]
        df = df.select(*cols)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
