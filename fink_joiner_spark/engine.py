"""Job assembly + CLI — the reference's entry-point surface
(SURVEY.md §2.7 / §3).

The reference ships three ``main``s driven by ``ParameterTool`` args
(``--state-path --bootstrap-server --listing-topic …``,
``CRMLSJoiner.scala:29-45``, invoked by ``run_code.sh``). This module
is the Spark analog: argparse → source builders → the snapshot-join
pipeline → sink, runnable either against Kafka (production) or a
staged-file replay (the TestJoiner-style manual harness, testable in
this container).

    python -m fink_joiner_spark.engine --mode file \
        --state-path /tmp/fjs_state --events-parquet /root/testdata/sf0.001/events.parquet

    python -m fink_joiner_spark.engine --mode kafka \
        --state-path s3://bucket/state --bootstrap-server broker:9092 \
        --listing-topic listings --agent-topic agents ...
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F

from fink_joiner_spark.operators import projections
from fink_joiner_spark.session import get_spark
from fink_joiner_spark.streaming.dedup_stream import SnapshotStore, run_dedup_stream

# the reference's six production topics (run_code.sh:6-11)
TOPIC_ARGS = (
    "listing-topic",
    "agent-topic",
    "open-house-topic",
    "office-topic",
    "media-topic",
    "history-topic",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fink_joiner_spark.engine",
        description="CRMLS dedup+join pipeline (Spark-native rebuild)",
    )
    p.add_argument("--mode", choices=["kafka", "file"], default="file")
    p.add_argument("--state-path", required=True,
                   help="snapshot/checkpoint root (reference: RocksDB state path)")
    p.add_argument("--bootstrap-server", help="Kafka bootstrap servers (kafka mode)")
    for t in TOPIC_ARGS:
        p.add_argument(f"--{t}", help=f"Kafka topic for {t.split('-')[0]} stream")
    p.add_argument("--events-parquet", help="staged parquet to replay (file mode)")
    p.add_argument("--sink", choices=["console", "none"], default="none")
    return p


def run(argv: list[str] | None = None, spark: SparkSession | None = None) -> SnapshotStore:
    """Assemble and run the pipeline to completion (AvailableNow in file
    mode; continuous in kafka mode). Returns the primary snapshot store."""
    args = build_parser().parse_args(argv)
    spark = spark or get_spark("fink-joiner-engine")

    if args.mode == "kafka":
        if not args.bootstrap_server:
            raise SystemExit("--bootstrap-server is required in kafka mode")
        from fink_joiner_spark.sources.streaming import kafka_json_source

        topic = getattr(args, "listing_topic", None)
        if not topic:
            raise SystemExit("--listing-topic is required in kafka mode")
        raw = kafka_json_source(spark, args.bootstrap_server, topic)
        parsed = projections.parse_envelope(raw, "value")
        store = SnapshotStore(f"{args.state_path}/listings", ["uc_pk"], "uc_created_ts")
        # continuous mode: micro-batches on a processing-time cadence,
        # block until externally stopped (the reference's env.execute())
        q = run_dedup_stream(
            parsed,
            store,
            changelog_dir=f"{args.state_path}/changelog",
            trigger={"processingTime": "10 seconds"},
        )
        q.awaitTermination()
        return store

    # file mode: replay a parquet table as the versioned stream
    if not args.events_parquet:
        raise SystemExit("--events-parquet is required in file mode")
    df = spark.read.parquet(args.events_parquet)
    if "ts" in df.columns and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    from fink_joiner_spark.sources.streaming import file_drip_feed

    stream = file_drip_feed(spark, df, f"{args.state_path}/stage", "ts", n_files=4)
    store = SnapshotStore(
        f"{args.state_path}/snapshot", ["user_id"], "ts", ["event_id"]
    )
    q = run_dedup_stream(stream, store, changelog_dir=f"{args.state_path}/changelog")
    q.awaitTermination()
    if args.sink == "console":
        store.read(spark).show(20, truncate=False)
    return store


if __name__ == "__main__":
    run()
