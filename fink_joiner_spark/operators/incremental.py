"""Incremental aggregate maintenance (materialized-view refresh).

A 100 TB metrics table is never recomputed from scratch per batch; the
pipeline keeps a PARTIAL-AGGREGATE state (mergeable summaries per key)
and folds each delta in. This module provides that pattern for the
distributive/algebraic aggregates (COUNT, SUM, MIN, MAX — AVG derives
from COUNT+SUM), with the refresh shaped as a keyed MERGE (full-outer
join + coalesce), NOT union+reaggregate:

* the state side can live bucketed on the key (``skew.write_bucketed``)
  so refresh shuffles ONLY the delta's partial aggregates — O(delta
  keys), while the state never moves (plan-audited in
  ``test_incremental.py``);
* sums are exact integers (cents), so state merged in any batch order
  is bit-identical to a full recompute — the invariant the oracle
  checks.

MIN/MAX are insert-only mergeable (a delete would need a full
recompute or per-key history); COUNT/SUM also merge retractions by
feeding negative deltas.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: partial-aggregate state columns produced by :func:`partial_agg`
STATE_COLS = ("n", "sum_cents", "min_v", "max_v")


def partial_agg(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Collapse raw rows into mergeable per-key partial aggregates:
    (keys…, n, sum_cents, min_v, max_v). One partial-agg shuffle; the
    cents integerization makes the state exactly mergeable."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(v * 100 + 0.5).cast("long")).alias("sum_cents"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(state: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold a delta's partial aggregates into the state: full-outer
    join on the keys, per-column merge (add counts/sums, least/greatest
    extremes). Keys absent from one side pass through.

    The join shape is what makes this scale: with the state bucketed on
    the keys, Spark shuffles only the delta side; union+groupBy would
    re-shuffle the ENTIRE state every refresh. Keys must be non-null
    (map nulls to a sentinel at ingest) — a null-safe join would
    rewrite the join keys to coalesce/isnull expressions and silently
    disable the bucketed layout (observed: "Bucketed: false (disabled
    by query planner)").
    """
    s, d = state.alias("s"), delta.alias("d")
    merged = s.join(d, on=list(keys), how="full_outer")
    return merged.select(
        *keys,
        (
            F.coalesce(F.col("s.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("s.sum_cents"), F.lit(0))
            + F.coalesce(F.col("d.sum_cents"), F.lit(0))
        ).alias("sum_cents"),
        F.least(F.col("s.min_v"), F.col("d.min_v")).alias("min_v"),
        F.greatest(F.col("s.max_v"), F.col("d.max_v")).alias("max_v"),
    )


def finalize(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Render the partial state as the user-facing view: derived AVG
    from the exact integer sums (reduction-order-independent).

    A fully-retracted group (``n = 0`` after negative deltas cancel all
    inserts) gets ``avg_v = NULL`` instead of a divide-by-zero (an
    error under ANSI mode). Caveat, by design of the mergeable state:
    COUNT/SUM retract exactly, but MIN/MAX are NOT retractable — after
    a retraction they may be stale (wider than the true extremum) until
    the group's state is rebuilt from base data. Callers needing exact
    MIN/MAX under deletion must trigger a per-group recompute.
    """
    return state.select(
        *keys,
        "n",
        "sum_cents",
        "min_v",
        "max_v",
        F.when(
            F.col("n") > 0, F.round(F.col("sum_cents") / 100.0 / F.col("n"), 4)
        ).alias("avg_v"),
    )


def z_normalize(df: DataFrame, mult_col: str = "mult") -> DataFrame:
    """Collapse a z-set (rows with signed multiplicities, the DBSP /
    differential-dataflow changelog encoding) to canonical form: group
    identical payloads, sum multiplicities, drop zeros."""
    payload = [c for c in df.columns if c != mult_col]
    return (
        df.groupBy(*payload)
        .agg(F.sum(mult_col).alias(mult_col))
        .where(F.col(mult_col) != 0)
    )


def delta_join(
    a: DataFrame,
    da: DataFrame,
    b: DataFrame,
    db: DataFrame,
    on: list[str] | str,
    mult_col: str = "mult",
) -> DataFrame:
    """Incremental maintenance of the join view V = A ⋈ B: given the
    OLD states and the batch deltas as z-sets, produce the view delta

        ΔV = ΔA ⋈ B  +  A ⋈ ΔB  +  ΔA ⋈ ΔB

    (the bilinearity of join — DBSP §5 / differential dataflow), with
    output multiplicity the product of the input multiplicities.
    Applying ΔV to the stored view (:func:`z_normalize` over the union)
    equals a full recompute of (A+ΔA) ⋈ (B+ΔB) — the invariant the
    oracle checks.

    Scale shape: the two BASE relations are the 100 TB side and are
    never shuffled — each term joins a base against a BROADCAST delta
    (deltas are batch-sized), so refresh cost is O(|ΔA|+|ΔB|) probe
    work, not O(|A|+|B|). Retractions (updates = delete + insert) flow
    through as negative multiplicities with no special casing.
    """
    keys = [on] if isinstance(on, str) else list(on)

    def term(left: DataFrame, right: DataFrame, bcast: str) -> DataFrame:
        l = left.withColumnRenamed(mult_col, "_ml")
        r = right.withColumnRenamed(mult_col, "_mr")
        if bcast == "left":
            l = F.broadcast(l)
        elif bcast == "right":
            r = F.broadcast(r)
        return l.join(r, keys).withColumn(mult_col, F.col("_ml") * F.col("_mr")).drop(
            "_ml", "_mr"
        )

    parts = [
        term(da, b, "left"),    # ΔA ⋈ B  — base B probes broadcast ΔA
        term(a, db, "right"),   # A ⋈ ΔB  — base A probes broadcast ΔB
        term(da, db, "left"),   # ΔA ⋈ ΔB — delta × delta, both tiny
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
