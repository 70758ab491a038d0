"""Sinks + checkpointing (SURVEY.md §2.1 S7/S8/S9).

The reference's output surface is a retract stream printed to stdout
(``toRetractStream.print()``, ``CRMLSJoiner.scala:489``) and a
(dead-code) Kafka JSON sink (``FlinkJoiner_backup.txt:626-665``). Spark
equivalents below; exactly-once (S9) = checkpointed offsets + state +
an idempotent sink, configured per-query via ``checkpoint_location``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def console_sink(
    df: DataFrame,
    output_mode: str = "update",
    checkpoint_location: str | None = None,
    trigger_available_now: bool = False,
) -> DataStreamWriter:
    """S7 — ``stream.print()`` analog."""
    w = df.writeStream.format("console").outputMode(output_mode)
    if checkpoint_location:
        w = w.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w


def kafka_payload(df: DataFrame) -> DataFrame:
    """The S8 wire projection: whole row -> one JSON ``value`` STRING
    column (the shape the Kafka sink requires). Split out so the
    contract is testable without a broker."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_json_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "update",
) -> DataStreamWriter:
    """S8 — publish rows as JSON to a Kafka topic
    (``registerTableSink`` + ``sqlUpdate("insert into …")``,
    ``FlinkJoiner_backup.txt:626-665``). Exactly-once via Kafka
    transactions is a cluster concern; the checkpoint gives at-least-
    once with idempotent downstream consumption."""
    payload = kafka_payload(df)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
    )


def memory_sink(df: DataFrame, query_name: str, output_mode: str = "append") -> DataStreamWriter:
    """Test sink: accumulate results in an in-memory table."""
    return df.writeStream.format("memory").queryName(query_name).outputMode(output_mode)


def parquet_sink(
    df: DataFrame, path: str, checkpoint_location: str
) -> DataStreamWriter:
    """Append-mode parquet sink — the durable changelog surface."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )


def write_partitioned(df, path: str, partition_cols, mode: str = "overwrite") -> None:
    """Batch partitioned-parquet writer — the training-data lake layout.

    Partitioning by low-cardinality curation columns (lang, source,
    date) makes downstream scans partition-prunable: a reader filtering
    on the partition column touches only matching directories
    (PartitionFilters in the scan, zero data read elsewhere).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def side_output_sink(
    df: DataFrame,
    predicate,
    good_path: str,
    dlq_path: str,
    checkpoint_location: str,
    trigger_available_now: bool = True,
) -> DataStreamWriter:
    """Side-output / dead-letter-queue pattern (Flink's
    ``OutputTag`` analog): rows passing ``predicate`` append to
    ``good_path``, the rest append to ``dlq_path`` with a rejection
    timestamp column — the standard malformed-record quarantine every
    production relay runs.

    NULL-predicate rows (the classic malformed record a DLQ exists to
    catch — the filter column itself is NULL) land in the DLQ: the
    reject filter is ``NOT coalesce(predicate, false)``, so
    good + DLQ always conserve the input. A bare ``~predicate`` would
    silently drop them from BOTH outputs under three-valued logic.

    One ``foreachBatch`` evaluates the batch ONCE (persist) and writes
    both splits; BOTH outputs carry ``_batch_id``, so when the
    streaming checkpoint re-runs a batchId after a partial failure
    (good write landed, DLQ write died), downstream readers dedupe
    either split on (_batch_id, row) for effective exactly-once. At
    scale each split is an ordinary partitioned parquet append — no
    extra shuffle beyond the split filter, which is a scan-resident
    predicate.
    """

    def write_split(batch: DataFrame, batch_id: int) -> None:
        keep = F.coalesce(predicate, F.lit(False))
        batch = batch.persist()
        try:
            (
                batch.where(keep)
                .withColumn("_batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(good_path)
            )
            (
                batch.where(~keep)
                .withColumn("_batch_id", F.lit(batch_id))
                .withColumn("_rejected_at", F.current_timestamp())
                .write.mode("append")
                .parquet(dlq_path)
            )
        finally:
            batch.unpersist()

    w = df.writeStream.foreachBatch(write_split).option(
        "checkpointLocation", checkpoint_location
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w
