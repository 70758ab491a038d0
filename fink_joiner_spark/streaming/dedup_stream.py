"""Streaming latest-version dedup via incremental snapshot maintenance.

The reference chains stateful ops in ONE continuous query — six keyed
dedup aggregates feeding an 11-way outer join, all incrementally
maintained with retractions (``CRMLSJoiner.scala:182-489``). Spark's
Structured Streaming disallows that exact cascade (multiple stateful
operators with update-mode semantics), so the idiomatic Spark design —
per SURVEY.md §7 — is *incremental snapshot maintenance*:

    every micro-batch:
      1. reduce the batch to latest-per-key (cheap, batch-local);
      2. MERGE it into a durable latest-snapshot table;
      3. emit the retract (+/−) delta of the snapshot;
      4. downstream joins read the maintained snapshots — plain batch
         joins per micro-batch, no unbounded join state.

On a production cluster step 2 is a Delta/Iceberg ``MERGE``; this
container has no Delta, so :class:`SnapshotStore` implements the same
contract (atomic version swap, idempotent re-apply) over versioned
parquet directories. The interface — ``upsert(batch) -> (inserts,
retracts)`` — is exactly Flink's retract stream
(``toRetractStream[Row]``: Boolean add/retract flag per row).

Scale: the per-batch merge shuffles only on the key; the snapshot
rewrite is bounded by snapshot size, not history size (at 100 TB you'd
partition the snapshot by key-hash bucket and rewrite only touched
buckets — with Delta MERGE that's automatic file-level pruning).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from fink_joiner_spark.operators.dedup import latest_per_key


class SnapshotStore:
    """Versioned-parquet latest-snapshot table with atomic pointer swap."""

    def __init__(self, path: str, keys: Sequence[str], order_col: str,
                 tie_breakers: Sequence[str] = ()):
        self.path = path
        self.keys = list(keys)
        self.order_col = order_col
        self.tie_breakers = list(tie_breakers)
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return json.load(f)["version"]

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v{v:06d}"))

    def upsert(self, batch_df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Merge a micro-batch; return (inserts, retracts) — the retract
        stream delta. Idempotent: re-applying the same batch yields an
        empty delta."""
        spark = batch_df.sparkSession
        batch_latest = latest_per_key(
            batch_df, self.keys, self.order_col, self.tie_breakers
        )
        old = self.read(spark)
        if old is None:
            new = batch_latest
        else:
            new = latest_per_key(
                old.unionByName(batch_latest), self.keys, self.order_col, self.tie_breakers
            )
        v = (self.current_version() or 0) + 1
        new_dir = os.path.join(self.path, f"v{v:06d}")
        new.write.mode("overwrite").parquet(new_dir)
        new = spark.read.parquet(new_dir)  # re-read: stable lineage for the diff
        if old is None:
            inserts, retracts = new, new.limit(0)
        else:
            inserts = new.exceptAll(old)
            retracts = old.exceptAll(new)
        with open(self._pointer, "w") as f:
            json.dump({"version": v}, f)
        self._gc(keep=2)
        return inserts, retracts

    def _gc(self, keep: int) -> None:
        v = self.current_version() or 0
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= v - keep:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


def run_dedup_stream(
    stream_df: DataFrame,
    store: SnapshotStore,
    changelog_dir: str | None = None,
) -> "StreamingQuery":
    """Wire a streaming DataFrame into snapshot maintenance.

    Each micro-batch upserts the store and (optionally) appends the
    retract delta as parquet under ``changelog_dir/batch=<id>`` with an
    ``is_retract`` flag — the durable ``toRetractStream`` analog.
    Overwrite-per-batch-dir keeps replays idempotent (S9/T6).
    """
    from pyspark.sql import functions as F

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inserts, retracts = store.upsert(batch_df)
        if changelog_dir is not None:
            delta = inserts.withColumn("is_retract", F.lit(False)).unionByName(
                retracts.withColumn("is_retract", F.lit(True))
            )
            delta.write.mode("overwrite").parquet(
                os.path.join(changelog_dir, f"batch={batch_id:06d}")
            )

    query = (
        stream_df.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(store.path, "_checkpoint"))
        .start()
    )
    return query
