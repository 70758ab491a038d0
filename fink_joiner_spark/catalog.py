"""Table loading + temp-view registration.

Mirrors the reference's pattern of registering each stream as a named
table and chaining derived views (``tEnv.registerTable``,
``CRMLSJoiner.scala:159-179``), but over the driver's parquet test data.

Scale note: parquet scans here are the 100 TB entry point — every
operator downstream must keep filters/projections pushable to these
scans. ``events.ts`` arrives in one of two shapes depending on the test
data vintage: TIMESTAMP(NANOS), which the legacy conf reads as a long
that we promote to a microsecond timestamp declaratively (cast stays
inside codegen), or native TIMESTAMP(MICROS), which parquet surfaces as
TIMESTAMP_NTZ and we cast to session-local TIMESTAMP (the session TZ is
pinned UTC, so the cast is value-preserving and oracle parity holds).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes the nanosecond ``events.ts``."""
    # Defensive: callers may hand us a session built without our
    # factory (the driver does) — these two confs are load-bearing
    # for reading the ns-timestamp test parquet and for oracle parity.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # nanos (long) -> microsecond timestamp; integer `div` (not
            # double `/`, which loses precision above 2^53) truncates the
            # way DuckDB converts ns->us, so oracle comparisons line up.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Native TIMESTAMP(MICROS) parquet surfaces as TIMESTAMP_NTZ;
            # unix_micros() and event-time windows require TIMESTAMP. The
            # session TZ is pinned UTC above, so this cast is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES, register: bool = True
) -> dict[str, DataFrame]:
    """Load tables and (optionally) register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
