"""Streaming sources (SURVEY.md §2.1 S1/S2/S3/S5 + file drip-feed).

Kafka/socket builders construct real streaming readers but cannot be
exercised in the test container (no broker); the file drip-feed source
is the testable stand-in — it replays a bounded table as a sequence of
micro-batches, which is also how the reference was manually tested
(scratch topics, ``TestJoiner.scala``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def kafka_json_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 — Kafka JSON topic from earliest offsets
    (``FlinkKafkaConsumer`` + ``JSONKeyValueDeserializationSchema`` +
    ``setStartFromEarliest``, ``CRMLSJoiner.scala:93-95``).

    Returns (key, value, topic, partition, offset, timestamp) with
    key/value cast to STRING — feed ``value`` to
    ``projections.parse_envelope``.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def kafka_avro_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    avro_schema_json: str,
    base64_wrapped: bool = False,
) -> DataFrame:
    """S2/S3 — Kafka binary-Avro source
    (``MyAvroDeserializationSchema.scala:13-45``; base64 variant
    ``BinaryAvroDeserializationSchema.scala:33-42`` /
    ``load_poc_data_topic.py:44-45``).

    Requires the spark-avro package on the cluster; import is deferred
    so environments without it can still use the JSON path.
    """
    from pyspark.sql.avro.functions import from_avro

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    value = F.unbase64(F.col("value").cast("string")) if base64_wrapped else F.col("value")
    return raw.select(from_avro(value, avro_schema_json).alias("record")).select("record.*")


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S5 — socket text lines (``env.socketTextStream``, WordCount.scala:40)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def file_drip_feed(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    order_col: str,
    n_files: int = 8,
) -> DataFrame:
    """Testable streaming source: spill ``df`` into ``n_files`` parquet
    files in ``order_col`` order, then return a file-stream reader that
    replays them one micro-batch per file (``maxFilesPerTrigger=1``).

    With ``Trigger.AvailableNow`` this yields a deterministic sequence
    of micro-batches — the harness for every streaming semantics test
    (SURVEY.md §5.2 item 3).
    """
    from pyspark.sql import Window

    staged = df.withColumn(
        "__file", F.ntile(n_files).over(Window.orderBy(order_col)) - 1
    )
    os.makedirs(stage_dir, exist_ok=True)
    # Written oldest-first; the file source processes by modification
    # time, so replay order == order_col order, one file per batch.
    for i in range(n_files):
        staged.filter(F.col("__file") == i).drop("__file").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage_dir, f"f{i:04d}"))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage_dir, "f*"))
    )
