"""Change-data-capture shapes: SCD-2 history compaction and MERGE
(upsert/delete) application.

The reference's production loop is itself a CDC consumer — it tails
per-entity changelogs and keeps the latest image per key
(``CRMLSJoiner.scala:181-205``, the dedup-by-(pk, mod_ts) views).
These operators cover the two downstream shapes that loop feeds at
warehouse scale: compacting a changelog into validity intervals
(SCD type 2) and applying a compacted delta batch onto a base
snapshot (MERGE).

Scale notes
-----------
* ``scd2_compact`` is ONE shuffle: both window passes partition by the
  same entity key, so the second pass (the LEAD for ``valid_to``) reuses
  the first pass's hash partitioning — Spark's EnsureRequirements
  inserts no second exchange, only a sort, and AQE sizes the single
  exchange.  At 100 TB the changelog shuffles once, keyed by entity.
* ``merge_upsert`` splits into a broadcastable LEFT join (updates and
  deletes applied map-side — the base never shuffles) plus a keys-only
  anti join for inserts. The delta side of a MERGE is normally orders
  of magnitude smaller than the base — ``broadcast_changes=True`` pins
  the broadcast-hash plan, which is the difference between "rewrite
  100 TB" and "stream the base past a broadcast map" on a real
  cluster. (A single full-outer formulation can NEVER broadcast:
  Spark has no broadcast-hash support for full outer joins.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_compact(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """Compact a changelog into SCD-2 validity intervals.

    Consecutive rows per key with an unchanged ``state_col`` collapse
    into one interval; each surviving change carries
    ``valid_from`` (its own event time) and ``valid_to`` (the next
    change's event time, NULL while current).

    Returns ``key_cols + [state_col, valid_from, valid_to, version]``
    where ``version`` is the 1-based change ordinal per key.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    first_order = order_cols[0]
    changes = (
        df.withColumn("_prev_state", F.lag(state_col).over(w))
        # NULL-safe inequality: the first row per key (prev IS NULL)
        # always opens an interval.
        .where(~F.col(state_col).eqNullSafe(F.col("_prev_state")))
        .drop("_prev_state")
    )
    # Second pass re-partitions by the SAME keys -> no new exchange.
    return changes.select(
        *key_cols,
        state_col,
        F.col(first_order).alias("valid_from"),
        F.lead(first_order).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    broadcast_changes: bool = False,
) -> DataFrame:
    """Apply a compacted delta batch onto a base snapshot (MERGE INTO).

    ``changes`` must hold at most one row per key with ``op_col`` in
    {'U', 'D'}: 'D' removes the key, 'U' upserts (update when the key
    exists in ``base``, insert when it doesn't). Non-key columns of
    ``changes`` overwrite the base's columns of the same name; base
    columns absent from ``changes`` are carried through unchanged (NULL
    on pure inserts).

    The output schema is the base schema (key cols first).

    Shape note: a FULL OUTER join cannot be broadcast in Spark (no
    broadcast-hash support for full outer), so a single-join MERGE
    always shuffles the base. This instead runs base LEFT OUTER
    ⋈ changes (broadcastable — update/delete applied map-side, the
    base never moves) UNION ALL changes LEFT ANTI ⋈ base-keys (insert
    detection; only the column-pruned key projection of the base
    shuffles). Identical result set to the full-outer formulation.
    """
    value_cols = [c for c in base.columns if c not in key_cols]
    overlap = set(value_cols) & (set(changes.columns) - set(key_cols) - {op_col})

    ch = F.broadcast(changes) if broadcast_changes else changes
    joined = base.alias("b").join(ch.alias("c"), on=list(key_cols), how="left")
    not_deleted = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    out_cols = []
    for c in value_cols:
        if c in overlap:
            # Upsert wins where a change row exists.
            out_cols.append(
                F.when(F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"b.{c}").alias(c))
    upserted = joined.where(not_deleted).select(
        *[F.col(k) for k in key_cols], *out_cols
    )

    inserts = (
        changes.where(F.col(op_col) != "D")
        .join(base.select(*key_cols), on=list(key_cols), how="left_anti")
        .select(
            *[F.col(k) for k in key_cols],
            *[
                F.col(c).alias(c)
                if c in overlap
                else F.lit(None).cast(base.schema[c].dataType).alias(c)
                for c in value_cols
            ],
        )
    )
    return upserted.unionByName(inserts)
