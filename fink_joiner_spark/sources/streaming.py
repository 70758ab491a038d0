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


# The Kafka source's fixed wire schema (Structured Streaming + Kafka
# Integration Guide). The projection helpers below are written against
# it, which lets the broker-less test container verify them on a static
# stand-in DataFrame with this exact schema.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_reader_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The reader option set both Kafka sources use — split out so the
    contract can be asserted without a broker or the connector jar."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_json_project(raw: DataFrame) -> DataFrame:
    """Post-read projection of S1: key/value bytes -> STRING plus the
    standard metadata columns. Pure column expressions over
    ``KAFKA_WIRE_SCHEMA`` — testable on any DataFrame with that shape."""
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def kafka_avro_project(
    raw: DataFrame, avro_schema_json: str, base64_wrapped: bool = False
) -> DataFrame:
    """Post-read projection of S2/S3: (optionally base64-unwrap then)
    Avro-decode ``value`` and flatten the record. Requires the
    spark-avro package; without it, ``from_avro`` raises
    AVRO_NOT_LOADED at analysis (pinned by the contract test)."""
    from pyspark.sql.avro.functions import from_avro

    value = F.unbase64(F.col("value").cast("string")) if base64_wrapped else F.col("value")
    return raw.select(from_avro(value, avro_schema_json).alias("record")).select("record.*")


def _kafka_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


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
    raw = _kafka_stream(
        spark, kafka_reader_options(bootstrap_servers, topic, starting_offsets)
    )
    return kafka_json_project(raw)


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
    raw = _kafka_stream(spark, kafka_reader_options(bootstrap_servers, topic))
    return kafka_avro_project(raw, avro_schema_json, base64_wrapped)


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
    import glob
    import shutil

    from pyspark.sql import Window

    staged = df.withColumn(
        "__file", F.ntile(n_files).over(Window.orderBy(order_col)) - 1
    )
    os.makedirs(stage_dir, exist_ok=True)
    # ONE write job for all slices (partitionBy), not one windowed-sort
    # job per slice — the stage cost of every streaming demo query was
    # n_files× this sort before. Replay order is then made
    # deterministic explicitly: the file source orders by modification
    # time, so stamp strictly increasing mtimes slice by slice.
    all_dir = os.path.join(stage_dir, "_staged")
    staged.repartition(1).write.mode("overwrite").partitionBy("__file").parquet(all_dir)
    base = 1_000_000_000  # epoch seconds; only relative order matters
    for i in range(n_files):
        dst = os.path.join(stage_dir, f"f{i:04d}")
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(dst)
        for j, part in enumerate(
            sorted(glob.glob(os.path.join(all_dir, f"__file={i}", "*.parquet")))
        ):
            tgt = os.path.join(dst, os.path.basename(part))
            shutil.move(part, tgt)
            os.utime(tgt, (base + i, base + i))
    shutil.rmtree(all_dir, ignore_errors=True)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage_dir, "f*"))
    )
