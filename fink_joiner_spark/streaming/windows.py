"""Watermarked event-time windows (SURVEY.md §2.5 T1-T5).

The reference's event-time contract: a bounded-out-of-orderness
watermark (100 s, ``FlinkJoiner.scala:342-349``) on an epoch timestamp
extracted from the payload; rows later than the watermark are dropped
by downstream event-time operators. Spark's ``withWatermark`` has the
same observable contract (drop-late + state GC), differing only in
*where* the drop happens (at the stateful operator, not the extractor)
— pinned by tests, per SURVEY.md §7.3 item 4.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

DEFAULT_LATENESS = "100 seconds"  # FlinkJoiner.scala:344


def with_event_time(df: DataFrame, ts_col: str, lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """T1/T2/T3 — declare the event-time attribute + watermark."""
    return df.withWatermark(ts_col, lateness)


def with_proc_time(df: DataFrame, col_name: str = "proctime") -> DataFrame:
    """T4 — processing-time attribute (``'proctime.proctime``,
    ``FlinkJoiner_backup.txt:181,195``).

    ``current_timestamp()`` in micro-batch execution is pinned to the
    micro-batch's start timestamp, so every row of a batch shares one
    proctime — Flink's proctime contract at micro-batch granularity
    (the documented semantic gap: sub-batch arrival order is not
    observable). Proctime is wall-clock by definition: results are not
    replay-stable, so proctime queries carry rows-only verification
    unless a downstream rollup erases the window boundaries.
    """
    return df.withColumn(col_name, F.current_timestamp())


def proctime_windowed_count(
    df: DataFrame,
    duration: str,
    keys: Sequence[str] = (),
    proc_col: str = "proctime",
) -> DataFrame:
    """T4 — processing-time tumbling-window count (the ``GROUP BY
    TUMBLE(proctime, ...)`` shape, ``FlinkJoiner_backup.txt:653-665``
    run on default/processing time like ``CRMLSJoiner``).

    No watermark: proctime windows close with the wall clock, so state
    for past windows is naturally bounded; in complete/update output
    mode the aggregation is incremental per batch. Emits window bounds
    so callers can assert alignment or roll the windows up.
    """
    p = with_proc_time(df, proc_col)
    out = p.groupBy(
        F.window(F.col(proc_col), duration), *[F.col(k) for k in keys]
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in keys],
        "cnt",
    )


def windowed_count(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """A5/T5 — watermarked tumbling-window count; works batch+streaming.

    In append output mode, a window is emitted exactly once, when the
    watermark passes its end — Flink's window-fire semantics.
    """
    wm = with_event_time(df, ts_col, lateness)
    out = wm.groupBy(F.window(F.col(ts_col), duration), *[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        *[F.col(k) for k in keys],
        "cnt",
    )


def with_ingest_metrics(df: DataFrame, ts_col: str, name: str = "ingest") -> DataFrame:
    """Attach per-micro-batch observability metrics to a stream via
    ``Dataset.observe`` — row count and the event-time frontier of each
    batch, surfaced in every ``StreamingQueryProgress`` under
    ``observedMetrics[name]``.

    This is the zero-cost production monitoring hook (metrics are
    computed inside the existing pass, no extra action): watermark lag
    = wall clock − ``max_event_ts``; late-drop auditing compares
    ``rows`` against the sink's output counts. The analog of the
    reference relying on Flink's built-in operator metrics.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.max(F.col(ts_col)).alias("max_event_ts"),
        F.min(F.col(ts_col)).alias("min_event_ts"),
    )
