"""Aggregation operators (SURVEY.md §2.3): global count (A3), keyed
ordered reduce (A4), tumbling windows (A5/A6).

All are single-shuffle hash aggregations with map-side partial
aggregation; the window forms group on a derived bucket column, so the
shuffle key is (bucket, key) — uniform even when the raw key is skewed
in time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def global_count(df: DataFrame, alias: str = "cnt") -> DataFrame:
    """A3 — ``SELECT COUNT(*)`` over an (updating) query result."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def keyed_ordered_concat(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    sep: str = "|",
    alias: str = "reduced",
) -> DataFrame:
    """A4 — keyed reduce that folds values in event order
    (``keyBy(1).reduce((i1,i2) => … concat …)``,
    ``FlinkJoiner_backup.txt:185-193``).

    Deterministic despite ``collect_list``'s arbitrary ordering:
    collect (order_cols…, value) structs, ``array_sort`` (field-order
    comparison), then project+join. Per-key state is bounded by per-key
    cardinality — same memory contract as Flink's reduce state.
    """
    struct_cols = [F.col(c) for c in order_cols] + [F.col(value_col)]
    arr = F.array_sort(F.collect_list(F.struct(*struct_cols)))
    concat = F.array_join(F.transform(arr, lambda x: x[value_col]), sep)
    return df.groupBy(*keys).agg(concat.alias(alias))


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
) -> DataFrame:
    """A5/A6 — tumbling window aggregation
    (``timeWindow(Time.seconds(5))`` `WordCount.scala:47`;
    ``GROUP BY TUMBLE(…, INTERVAL '20' MINUTE)``
    `FlinkJoiner_backup.txt:653-665`).

    Uses Spark's ``window()`` (epoch-aligned, same bucketing as Flink's
    TUMBLE); works identically on batch and streaming DataFrames.
    """
    aggs = list(aggs) or [F.count(F.lit(1)).alias("cnt")]
    grouped = df.groupBy(F.window(F.col(ts_col), duration), *[F.col(k) for k in keys])
    out = grouped.agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def numeric_histogram(
    df: DataFrame, value_col: str, width: float, lo: float = 0.0
) -> DataFrame:
    """Fixed-width histogram of a numeric column: per-bin count,
    min/max, and an exact-integer value sum (cents), avoiding a float
    SUM whose last-ulp value depends on reduction order.

    One partial-agg groupBy keyed by bin — the data-profiling pass a
    pipeline runs before choosing filter thresholds. ``avg_v`` is
    derived from the integer cents sum, so it is bit-identical across
    engines and partitionings.
    """
    v = F.col(value_col)
    bin_id = F.floor((v - lo) / width).cast("long")
    cents = F.floor(v * 100 + 0.5).cast("long")
    return (
        df.select(bin_id.alias("bin"), v.alias("v"), cents.alias("cents"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "bin",
            "n",
            "min_v",
            "max_v",
            "sum_cents",
            F.round(F.col("sum_cents") / 100.0 / F.col("n"), 4).alias("avg_v"),
        )
    )
