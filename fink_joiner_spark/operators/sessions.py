"""Batch sessionization — gap-based session assignment over an event
log.

The streaming counterpart (``F.session_window``, t5_session_window)
assigns sessions inside the engine; training-data pipelines also need
the BATCH form — e.g. turning raw interaction logs into per-session
training examples, or computing engagement features — where the whole
log is sessionized in one pass.

Plan shape: one shuffle keyed by the entity (the window partition);
inside each partition two window functions (lag + running sum) assign
session indexes without any join or iterative pass. Scale: sessions
never cross entity keys, so the single hash partitioning is the only
data movement no matter the corpus size; skewed entities (one user
with millions of events) stay a single partition — at 100 TB you'd
pre-split such bots by (user_id, day) before sessionizing.

Reference has no session operator; this extends the T5 window family
(``FlinkJoiner.scala`` tumbling/sliding windows) the same way
session_window extends tumble in the streaming API.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Assign ``session_idx`` (1-based per key) to every row: a new
    session starts when the gap to the previous event of the same key
    exceeds ``gap`` (an interval literal).

    Event order inside a key is (ts, *tie_breakers) — the tie-breakers
    make the assignment deterministic when timestamps collide.
    """
    order: list[Column] = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tie_breakers]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
        1,
    ).otherwise(0)
    running = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Per-session aggregate view: (key…, session_idx, n_events,
    session_start_us, duration_us). Exact integer microseconds so the
    DuckDB oracle hashes identically."""
    s = sessionize(df, key_cols, ts_col, gap, tie_breakers)
    us = F.unix_micros(F.col(ts_col))
    return (
        s.withColumn("_us", us)
        .groupBy(*key_cols, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("session_start_us"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
        )
    )
