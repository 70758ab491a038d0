"""Custom stateful streaming operators (SURVEY.md §7 M4):

* :func:`streaming_asof_join` — J3 in streaming mode: per-key version
  history kept in Arrow-batched grouped state
  (``applyInPandasWithState``), each probe row joined to the latest
  build version with ts <= probe-ts. The streaming analog of Flink's
  temporal table function state (``FlinkJoiner.scala:231-257``).
* :func:`streaming_keyed_reduce` — A4: running per-key fold
  (``keyBy().reduce``, ``FlinkJoiner_backup.txt:185-193``) emitting the
  updated accumulator every micro-batch (update-mode retract analog).

State GC: version history older than ``keep_versions_s`` below the
newest version is pruned each batch, keeping the newest older-than-
cutoff version so as-of lookups stay correct — the bounded-state
contract Flink gets from state TTL + watermarks (SURVEY.md §7.3 #3).

Scale notes: state is per-key and Arrow-batched; the shuffle is the
single groupBy(key) exchange. Version values cross the Python boundary
as JSON strings — schema-agnostic, and only the changed keys' state is
(de)serialized per batch with RocksDB state store enabled.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.ArrayType(T.DoubleType())),
        T.StructField("vals", T.ArrayType(T.StringType())),
    ]
)


def tag_streams(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    build_cols: Sequence[str],
) -> DataFrame:
    """Union-tag probe and build streams into the single keyed stream
    the stateful operator consumes (same shape as the batch plan)."""
    p = probe.select(
        F.col(on).alias("k"),
        F.col(probe_ts).cast("double").alias("ts"),
        F.lit(1).alias("side"),
        F.to_json(F.struct(*probe.columns)).alias("payload"),
    )
    b = build.select(
        F.col(on).alias("k"),
        F.col(build_ts).cast("double").alias("ts"),
        F.lit(0).alias("side"),
        F.to_json(F.struct(*[F.col(c) for c in build_cols])).alias("payload"),
    )
    return b.unionByName(p)


def streaming_asof_join(
    tagged: DataFrame,
    keep_versions_s: float = 3600.0,
) -> DataFrame:
    """Stateful as-of join over a tagged stream (see :func:`tag_streams`).

    Emits one row per probe: (k, ts, probe_json, build_json) where
    build_json is the latest version with version-ts <= probe-ts (NULL
    if none). Parse the JSON columns downstream with ``from_json``.

    Within a micro-batch, rows are processed in (ts, build-first)
    order, so equal-ts versions are visible — identical tie semantics
    to the batch operator.
    """
    out_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.DoubleType()),
            T.StructField("probe_json", T.StringType()),
            T.StructField("build_json", T.StringType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Vectorized: one stable merge of (state versions ++ batch builds)
        # plus one np.searchsorted over all probes — no per-row Python.
        # Equivalent to interleaved (ts, build-first) processing because
        # in that order a probe at ts t sees exactly the builds with
        # ts <= t (equal-ts builds sort before the probe), which is
        # searchsorted(side="right") over the merged version array.
        import numpy as np

        if state.exists:
            ver_ts = np.asarray(state.get[0], dtype=np.float64)
            ver_val = np.asarray(state.get[1], dtype=object)
        else:
            ver_ts = np.empty(0, dtype=np.float64)
            ver_val = np.empty(0, dtype=object)

        batch = pd.concat(list(pdfs), ignore_index=True)
        builds = batch[batch["side"] == 0].sort_values("ts", kind="stable")
        probes = batch[batch["side"] == 1].sort_values("ts", kind="stable")

        if len(builds):
            all_ts = np.concatenate([ver_ts, builds["ts"].to_numpy(np.float64)])
            all_val = np.concatenate([ver_val, builds["payload"].to_numpy(object)])
            # stable: state entries stay before same-ts batch builds, so
            # the later-arriving build wins ties — insertion-order parity
            order = np.argsort(all_ts, kind="stable")
            ver_ts, ver_val = all_ts[order], all_val[order]

        if len(probes):
            p_ts = probes["ts"].to_numpy(np.float64)
            if len(ver_ts):
                idx = np.searchsorted(ver_ts, p_ts, side="right") - 1
                match = np.where(idx >= 0, ver_val[np.clip(idx, 0, None)], None)
            else:
                match = np.full(len(p_ts), None, dtype=object)
            out = pd.DataFrame(
                {
                    "k": key[0],
                    "ts": p_ts,
                    "probe_json": probes["payload"].to_numpy(object),
                    "build_json": match,
                }
            )
        else:
            out = pd.DataFrame(columns=["k", "ts", "probe_json", "build_json"])

        # GC: drop versions older than cutoff, keeping the newest such
        # version (still the valid as-of answer for future probes).
        if len(ver_ts):
            cutoff = ver_ts[-1] - keep_versions_s
            start = max(0, int(np.searchsorted(ver_ts, cutoff, side="left")) - 1)
            ver_ts, ver_val = ver_ts[start:], ver_val[start:]
        state.update((ver_ts.tolist(), ver_val.tolist()))
        yield out

    return tagged.groupBy("k").applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def streaming_keyed_reduce(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    sep: str = "",
) -> DataFrame:
    """A4 streaming: per-key running concat, emitted per micro-batch.

    ``order_cols`` fix the fold order *within* each micro-batch (batches
    themselves arrive in stream order), making the accumulated value
    deterministic. Output: (k, reduced, n_items); the row with the max
    ``n_items`` per key is the final accumulator (update-mode semantics).
    """
    out_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("reduced", T.StringType()),
            T.StructField("n_items", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("acc", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    ocols = [f"o{i}" for i in range(len(order_cols))]
    tagged = stream.select(
        F.col(key_col).cast("long").alias("k"),
        F.col(value_col).cast("string").alias("v"),
        *[F.col(c).alias(a) for c, a in zip(order_cols, ocols)],
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc, n = state.get if state.exists else ("", 0)
        # O(total length) join, not O(n^2) repeated concat
        parts = [acc] if n else []
        for pdf in pdfs:
            if ocols:
                pdf = pdf.sort_values(ocols)
            parts.extend(pdf["v"])
            n += len(pdf)
        acc = sep.join(parts)
        state.update((acc, n))
        yield pd.DataFrame([(key[0], acc, n)], columns=["k", "reduced", "n_items"])

    return tagged.groupBy("k").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def _dedup_retract_batch(
    key, pdfs: Iterator[pd.DataFrame], cur: tuple
) -> tuple[pd.DataFrame, tuple | None]:
    """Shared vectorized core of the dedup-retract operator: given the
    current state (ts, seq, payload|None) and this batch's rows, return
    (output changelog frame, new state or None-if-unchanged).

    Sorted ascending by (ts_us, seq), every surviving row supersedes
    the previous one — so inserts are the suffix of rows beating the
    state, and retracts are all inserts but the last, plus the prior
    state row. No per-row Python loop.
    """
    cur_ts, cur_seq, cur_pl = cur
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts_us", "seq"]).drop_duplicates(
        ["ts_us", "seq"], keep="first"
    )
    beats = (batch["ts_us"] > cur_ts) | (
        (batch["ts_us"] == cur_ts) & (batch["seq"] > cur_seq)
    )
    valid = batch[beats]
    cols = ["k", "ts_us", "seq", "payload", "is_retract"]
    if valid.empty:
        return pd.DataFrame(columns=cols), None
    inserts = valid[["ts_us", "seq", "payload"]].assign(is_retract=False)
    retracts = valid[["ts_us", "seq", "payload"]].iloc[:-1].assign(is_retract=True)
    if cur_pl is not None:
        retracts = pd.concat(
            [
                pd.DataFrame(
                    [(cur_ts, cur_seq, cur_pl, True)],
                    columns=["ts_us", "seq", "payload", "is_retract"],
                ),
                retracts,
            ],
            ignore_index=True,
        )
    out = pd.concat([inserts, retracts], ignore_index=True)
    out.insert(0, "k", key[0])
    last = valid.iloc[-1]
    return out[cols], (int(last.ts_us), int(last.seq), last.payload)


class _LatestVersionProcessor:
    """``StatefulProcessor`` keeping the max-(ts, seq) version per key and
    emitting a retract (+insert) pair whenever a newer version supersedes
    the current one — the reference's dedup + ``toRetractStream``
    (``CRMLSJoiner.scala:182,489``) on Spark 4's ``transformWithState``
    API (ValueState + optional TTL), the modern analog of Flink's
    RocksDB keyed state with state TTL.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "latest", "ts_us BIGINT, seq BIGINT, payload STRING", self._ttl_ms
        )

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        cur = self._state.get() if self._state.exists() else (-1, -1, None)
        out, new_state = _dedup_retract_batch(key, rows, tuple(cur))
        if new_state is not None:
            self._state.update(new_state)
        yield out

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """``transformWithStateInPandas`` needs the protobuf wire format for
    its state-server protocol; gate on it (import-try, per environment).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_RETRACT_OUT_DDL = "k BIGINT, ts_us BIGINT, seq BIGINT, payload STRING, is_retract BOOLEAN"


def streaming_dedup_retract(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    payload_col: str,
    ttl_ms: int | None = None,
    api: str = "auto",
) -> DataFrame:
    """A1 + retract output as a custom stateful streaming operator.

    Input: any stream with a long key, bigint ``ts_col`` (ordering),
    bigint ``seq_col`` (tie-break), string ``payload_col``. Output: an
    append changelog (k, ts_us, seq, payload, is_retract); replaying it
    (net insert−retract count per row) yields exactly the latest-per-key
    snapshot. ``ttl_ms`` bounds state like Flink's state TTL.

    ``api``: "tws" = Spark 4 ``transformWithStateInPandas`` (ValueState
    + TTL; needs protobuf), "apws" = ``applyInPandasWithState``
    (identical semantics/output), "auto" = tws when available.
    """
    tagged = stream.select(
        F.col(key_col).cast("long").alias("k"),
        F.col(ts_col).cast("long").alias("ts_us"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(payload_col).cast("string").alias("payload"),
    )
    if api == "auto":
        api = "tws" if tws_available() else "apws"
    if api == "tws":
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        proc = type(
            "LatestVersionProcessor", (_LatestVersionProcessor, StatefulProcessor), {}
        )(ttl_ms)
        return tagged.groupBy("k").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=_RETRACT_OUT_DDL,
            outputMode="Append",
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur = tuple(state.get) if state.exists else (-1, -1, None)
        out, new_state = _dedup_retract_batch(key, pdfs, cur)
        if new_state is not None:
            state.update(new_state)
        yield out

    return tagged.groupBy("k").applyInPandasWithState(
        fn,
        T._parse_datatype_string(_RETRACT_OUT_DDL),
        "ts_us BIGINT, seq BIGINT, payload STRING",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def parse_asof_output(
    out: DataFrame, probe_schema: T.StructType, build_schema: T.StructType
) -> DataFrame:
    """Rehydrate typed columns from the stateful operator's JSON output."""
    return out.select(
        F.from_json("probe_json", probe_schema).alias("p"),
        F.from_json("build_json", build_schema).alias("b"),
    ).select("p.*", "b.*")


# NOTE on ordering across batches: like any streaming as-of, a build
# version that ARRIVES after a probe was already emitted cannot
# retroactively re-match it (append mode emits once). When input is
# drip-fed in event-time order — the reference's Kafka topics are
# approximately so — the streaming result equals the batch as-of join;
# the equivalence test pins exactly that. Out-of-order builds within
# the same micro-batch ARE handled (per-batch sort + state).
