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
