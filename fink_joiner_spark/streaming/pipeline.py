"""The CRMLS pipeline, streaming mode — the reference's production job
re-architected for Spark (SURVEY.md §3.1 / §7).

Reference shape (``CRMLSJoiner.scala``): 6 Kafka topics → envelope
parse → latest-per-key dedup ×6 → 11-way LEFT JOIN → retract stream.

Spark shape: each input stream maintains a :class:`SnapshotStore`
(incremental latest-snapshot upsert per micro-batch); after each round
of upserts, the join runs as a *batch* query over the maintained
snapshots and its retract delta is emitted. This sidesteps Spark's
multiple-stateful-operator restriction and — more importantly at
100 TB — bounds join state: a stream-stream outer join would buffer
both full streams in the state store forever (no watermark can GC a
changelog join), whereas snapshot joins only ever touch current
entity versions.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from fink_joiner_spark.streaming.dedup_stream import SnapshotStore


class StreamDef:
    """One input stream: a streaming DataFrame + its dedup contract."""

    def __init__(
        self,
        name: str,
        stream_df: DataFrame,
        keys: Sequence[str],
        order_col: str,
        tie_breakers: Sequence[str] = (),
    ):
        self.name = name
        self.stream_df = stream_df
        self.keys = keys
        self.order_col = order_col
        self.tie_breakers = tie_breakers


def run_snapshot_join_pipeline(
    spark: SparkSession,
    streams: Sequence[StreamDef],
    join_fn: Callable[[Mapping[str, DataFrame]], DataFrame],
    work_dir: str,
    result_name: str = "result",
) -> dict[str, SnapshotStore]:
    """Drive all input streams to completion (AvailableNow), maintaining
    one snapshot per stream, then materialize the joined result and its
    retract delta against the previous run's result.

    Returns the snapshot stores (``result_name`` store holds the joined
    output; its changelog parquet is the retract stream).
    """
    stores: dict[str, SnapshotStore] = {}
    queries = []
    for s in streams:
        store = SnapshotStore(
            os.path.join(work_dir, s.name), s.keys, s.order_col, s.tie_breakers
        )
        stores[s.name] = store

        def process(batch_df: DataFrame, batch_id: int, _store=store) -> None:
            _store.upsert(batch_df, batch_id=batch_id)

        q = (
            s.stream_df.writeStream.foreachBatch(process)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(work_dir, s.name, "_checkpoint"))
            .start()
        )
        queries.append(q)
    for q in queries:
        q.awaitTermination()

    snapshots = {name: store.read(spark) for name, store in stores.items()}
    joined = join_fn(snapshots)
    # The joined result is itself snapshot-maintained: its upsert delta
    # is the retract stream of the continuous join.
    result_store = SnapshotStore(
        os.path.join(work_dir, result_name),
        keys=[joined.columns[0]],
        order_col=joined.columns[0],
    )
    # For the join result we want full-row diff semantics, not
    # latest-per-key — store the rows verbatim and diff.
    inserts, retracts = _diff_upsert(result_store, joined)
    from pyspark.sql import functions as F

    delta = inserts.withColumn("is_retract", F.lit(False)).unionByName(
        retracts.withColumn("is_retract", F.lit(True))
    )
    delta.write.mode("overwrite").parquet(os.path.join(work_dir, result_name, "changelog"))
    stores[result_name] = result_store
    return stores


def _diff_upsert(store: SnapshotStore, new: DataFrame):
    """Multiset diff upsert: replace the stored relation with ``new``,
    returning (inserts, retracts) — exact ``toRetractStream`` deltas.

    Unlike :meth:`SnapshotStore.upsert` (which knows touched buckets
    from the batch), a full-relation replace must diff everything — but
    the REWRITE is still bucket-pruned: only key-hash buckets that
    actually changed are written to the new version; unchanged buckets
    carry forward by reference. (Compute is O(new+old) — inherent to
    re-deriving a full join result; on a production cluster this store
    is a Delta/Iceberg table and the delta comes from MERGE instead.)
    """
    from pyspark.sql import functions as F

    spark = new.sparkSession
    # pin the computed relation: one evaluation serves diff + write
    new = new.localCheckpoint(eager=True)
    bexpr = store._bucket_expr()
    old = store.read(spark)
    if old is None:
        inserts, retracts = new, new.limit(0)
    else:
        inserts, retracts = new.exceptAll(old), old.exceptAll(new)
    changed = sorted(
        r[0]
        for r in inserts.select(bexpr.alias("_b"))
        .unionByName(retracts.select(bexpr.alias("_b")))
        .distinct()
        .collect()
    )
    if changed:
        st = store._state() or {"version": 0, "buckets": {}}
        v = st["version"] + 1
        new_dir = os.path.join(store.path, f"v{v:06d}")
        (
            new.withColumn("_bucket", bexpr)
            .where(F.col("_bucket").isin([int(b) for b in changed]))
            .repartition(max(1, min(len(changed), 32)), "_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(new_dir)
        )
        written = {
            p.split("=", 1)[1]
            for p in os.listdir(new_dir)
            if p.startswith("_bucket=")
        }
        buckets = dict(st["buckets"])
        for b in changed:
            if str(b) in written:
                buckets[str(b)] = v
            else:  # bucket fully emptied by the replace
                buckets.pop(str(b), None)
        store._swap_pointer({"version": v, "buckets": buckets})
        store._gc(keep=2)
    return inserts, retracts
