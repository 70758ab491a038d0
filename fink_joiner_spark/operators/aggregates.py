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


def strict_running_max_by_value(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "run_max",
    n_ranges: int = 256,
) -> DataFrame:
    """Scalable strict-preceding running max: for every row, the max of
    ``value_col`` over all rows with a strictly GREATER ``order_col``
    (descending-order "everything before me"), without the
    single-task ``Window.orderBy(...)`` global sort.

    Requires ``order_col`` values to be distinct numeric (the caller's
    rows are usually already a groupBy on ``order_col``) — then the
    "preceding" set is value-defined and needs no global row ordering.

    Two-phase, the ``ordered_positions`` shape (sampling.py): phase 1
    buckets ``order_col`` into ``n_ranges`` equal-width ranges and
    aggregates max(value) per range (output ≤ n_ranges rows); the
    driver suffix-maxes ONLY those (the max over all ranges ABOVE each
    range) and broadcasts the result. Phase 2 hash-partitions by range
    id — never one task — and computes the within-range strict running
    max with a PARTITIONED window, combining it with the broadcast
    cross-range max. Nothing data-sized touches the driver, and the
    plan's only exchanges are one hash shuffle + one broadcast.

    The eager min/max + per-range-max passes are aggregate-sized
    map-side-combined scans of ``df``; cache ``df`` upstream if it is
    itself expensive to recompute.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    vtype = df.schema[value_col].dataType.simpleString()
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast(vtype))
    width = max(1, (int(hi) - int(lo)) // n_ranges + 1)
    rng = ((F.col(order_col) - F.lit(int(lo))) / width).cast("int")

    range_max = {
        r["_r"]: r["_m"]
        for r in df.groupBy(rng.alias("_r"))
        .agg(F.max(value_col).alias("_m"))
        .collect()
    }
    # suffix max over STRICTLY higher ranges, descending walk.
    # NULL-tolerant (ADVICE r5): a NULL order_col lands in range None
    # (skipped — those rows drop at the broadcast join, matching the
    # SQL semantics where NULL order never precedes anything), and an
    # all-NULL-value range contributes nothing to the suffix max.
    above, acc = [], None
    for r in sorted((k for k in range_max if k is not None), reverse=True):
        above.append((r, acc))
        m = range_max[r]
        if m is not None:
            acc = m if acc is None else max(acc, m)
    off_df = spark.createDataFrame(above, f"_rng int, _above {vtype}")

    w = (
        Window.partitionBy("_rng")
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    # greatest() skips NULLs: local is NULL on each range's first row,
    # _above is NULL for the globally-highest range
    return (
        df.withColumn("_rng", rng)
        .join(F.broadcast(off_df), "_rng")
        .withColumn(out_col, F.greatest(local, F.col("_above")))
        .drop("_rng", "_above")
    )


def running_sum_by_value(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "run_sum",
    n_ranges: int = 256,
) -> DataFrame:
    """Scalable INCLUSIVE global prefix sum: for every row, the sum of
    ``value_col`` over all rows with ``order_col`` <= this row's —
    without the single-task ``Window.orderBy(...)`` global sort.
    Requires distinct numeric ``order_col`` values (use a dense
    position column, e.g. ``sampling.shuffle_positions``).

    Same two-phase skeleton as :func:`strict_running_max_by_value`:
    per-range sums to the driver (<= n_ranges rows), prefix-summed
    over LOWER ranges, broadcast back; a hash-partitioned window
    completes the sum inside each range. The driver never sees a row.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    width = max(1, (int(hi) - int(lo)) // n_ranges + 1)
    rng = ((F.col(order_col) - F.lit(int(lo))) / width).cast("int")

    range_sum = {
        r["_r"]: r["_s"]
        for r in df.groupBy(rng.alias("_r"))
        .agg(F.sum(F.col(value_col).cast("long")).alias("_s"))
        .collect()
    }
    below, acc = [], 0
    for r in sorted(range_sum):
        below.append((r, acc))
        acc += range_sum[r] or 0
    off_df = spark.createDataFrame(below, "_rng int, _below long")

    w = (
        Window.partitionBy("_rng")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = F.sum(F.col(value_col).cast("long")).over(w)
    return (
        df.withColumn("_rng", rng)
        .join(F.broadcast(off_df), "_rng")
        .withColumn(out_col, F.coalesce(local, F.lit(0)) + F.col("_below"))
        .drop("_rng", "_below")
    )
