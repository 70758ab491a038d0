"""Banded (binned) interval join — the scalable plan for range joins.

A pure range predicate (``|a.ts - b.ts| <= band``) has no equi-key, so
Catalyst's only native strategy is a broadcast nested-loop / cartesian
product — O(n·m) comparisons, unusable at scale. The standard fix is
*binning*: quantize time into ``band``-sized bins, replicate the left
side into its own bin and the two neighbors, equi-join on the bin, then
re-apply the exact predicate. Each row is compared only against rows in
a ±1-bin neighborhood, the join is a plain hash/sort-merge equi-join on
``bin`` (+ any extra keys), and the replication factor is a constant 3.

At 100 TB: shuffle is O(3n + m) rows hashed on bin — bin cardinality
grows with the time span, so partitions stay balanced unless the data
is pathologically bursty (then: composite bin key with a salt, same
pattern as skew.salted_join).

Spark's own AQE has no rewrite for this (Databricks' range-join hint is
proprietary); this operator is the open equivalent expressed in plain
DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band: float,
    extra_keys: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Inner-join rows with ``|left_ts - right_ts| <= band`` (plus any
    ``extra_keys`` equi-conditions) without a cartesian product.

    ``left_ts`` / ``right_ts`` are numeric (cast your timestamps to
    epoch seconds/micros first); ``band`` is in the same unit. Output
    has all left columns + all right columns (caller should alias
    collisions away beforehand).
    """
    if band <= 0:
        raise ValueError("band must be positive")
    l_bin = F.floor(F.col(left_ts) / band)
    r_bin = F.floor(F.col(right_ts) / band)
    lx = left.withColumn(
        "_bin", F.explode(F.array(l_bin - 1, l_bin, l_bin + 1))
    )
    rx = right.withColumn("_bin", r_bin)
    cond = [lx["_bin"] == rx["_bin"]] + [
        lx[a] == rx[b] for a, b in extra_keys
    ]
    joined = lx.join(rx, cond, "inner").drop("_bin")
    return joined.filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= band
    )
