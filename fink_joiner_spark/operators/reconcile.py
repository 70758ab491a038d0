"""Table reconciliation via order-independent bucket digests.

The 100 TB table-diff problem: two copies of a table (a live table and
a replicated / snapshotted / migrated copy) must be compared without
shipping either. Exchanging the rows is O(data); exchanging per-bucket
digests is O(buckets). Each side computes, in one partial-aggregated
shuffle, a digest per hash bucket — row count, an additive checksum
(SUM of a per-row integer signature) and a XOR checksum (BIT_XOR of
the same signature) — then the two digest tables (buckets × 4 columns,
KBs regardless of data size) are joined and only mismatching buckets
are reported for targeted row-level repair. SUM and XOR are both
commutative/associative, so partition order, reduction order and AQE
re-planning can never flip a digest; carrying BOTH catches mutations
that cancel in one (a +1/-1 pair cancels in SUM but not in XOR unless
the signatures collide).

The per-row signature is deliberately plain integer arithmetic
(``(k % p) * c1 + ... % p * cn``) rather than an engine hash builtin:
it is bit-for-bit reproducible on ANY engine that has 64-bit integers
and ``%`` — which is the point of a cross-system reconciliation
protocol — and every term is bounded well under 2^63 so ANSI-mode
overflow checking never trips.

No single-row equivalent exists in the reference (its joiner trusts
Flink's exactly-once sink, ``CRMLSJoiner.scala:504-519``); this is the
batch-side audit a lake pipeline runs to prove that trust.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Per-term modulus. Each signature term is < SIG_MOD * weight
# (~8.2e9 ≈ 2^33 at the largest default weight), so the PER-ROW
# signature fits int64 easily — but a plain int64 SUM of 2^33-sized
# signatures overflows at ~2^30 rows per bucket, which a 100 TB table
# reaches. ``bucket_digest`` therefore sums in DECIMAL(38,0) (room for
# ~10^28 rows per bucket) and reduces mod 2^61 back to a portable
# int64 checksum.
SIG_MOD = 1_000_003

# Additive-checksum modulus: digests exchange ``SUM(sig) % SUM_MOD`` as
# an int64. 2^61 keeps the value far inside int64 on every engine while
# preserving all mismatch-detection power of the full sum (a mutation
# escapes only if its delta is an exact multiple of 2^61 AND the XOR
# checksum also collides).
SUM_MOD = 1 << 61


def row_signature(terms: Sequence[tuple[Column, int]]) -> Column:
    """Portable per-row integer signature: sum of (col % SIG_MOD) * weight.

    ``terms`` pairs a bigint column with a small co-prime weight. Weights
    keep column transpositions (a value moving between columns) from
    cancelling.

    NULL handling: a NULL term maps to the sentinel residue ``SIG_MOD``
    (unreachable by any non-null value, whose residue is strictly
    between -SIG_MOD and SIG_MOD) — so a NULL is distinguishable from 0
    and a row with a NULL column still contributes a non-NULL signature.
    Without this, ``F.sum``/``F.bit_xor`` would silently skip the whole
    row and a mutation in it would be invisible to both checksums while
    counts still matched.
    """
    sig = F.lit(0).cast("long")
    for col, weight in terms:
        sig = sig + F.coalesce(
            col.cast("long") % SIG_MOD, F.lit(SIG_MOD).cast("long")
        ) * F.lit(weight)
    return sig


def bucket_digest(
    df: DataFrame, key: Column, sig: Column, n_buckets: int = 64
) -> DataFrame:
    """Collapse a table to per-bucket digests: (bucket, cnt, sig_sum, sig_xor).

    One partial-aggregated shuffle keyed by ``key % n_buckets``; the
    output is n_buckets rows no matter how large the input — the only
    thing two reconciling systems ever exchange.

    The additive checksum sums in DECIMAL(38,0) (no int64 overflow at
    any bucket size up to ~10^28 rows) and publishes ``SUM % 2^61`` as
    int64 — the portable form any engine with 128-bit/decimal sums can
    reproduce (DuckDB: ``(SUM(sig) % (1<<61))::BIGINT`` — its BIGINT
    SUM is HUGEINT already).
    """
    return (
        df.select((key.cast("long") % n_buckets).alias("bucket"), sig.alias("sig"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.col("sig").cast("decimal(38,0)")) % F.lit(SUM_MOD))
            .cast("long")
            .alias("sig_sum"),
            F.bit_xor("sig").alias("sig_xor"),
        )
    )


def digest_diff(cur: DataFrame, snap: DataFrame) -> DataFrame:
    """Full-outer join two digest tables and keep mismatching buckets.

    Null-safe comparison (``eqNullSafe``) so a bucket present on only
    one side (all its rows deleted) is itself a reported difference.
    The join input is digest-sized, so this is driver-trivial at any
    data scale.
    """
    a = cur.select(
        "bucket",
        F.col("cnt").alias("cnt_cur"),
        F.col("sig_sum").alias("sum_cur"),
        F.col("sig_xor").alias("xor_cur"),
    )
    b = snap.select(
        F.col("bucket").alias("b_bucket"),
        F.col("cnt").alias("cnt_snap"),
        F.col("sig_sum").alias("sum_snap"),
        F.col("sig_xor").alias("xor_snap"),
    )
    joined = a.join(b, a["bucket"] == b["b_bucket"], "full_outer")
    mismatch = (
        ~F.col("cnt_cur").eqNullSafe(F.col("cnt_snap"))
        | ~F.col("sum_cur").eqNullSafe(F.col("sum_snap"))
        | ~F.col("xor_cur").eqNullSafe(F.col("xor_snap"))
    )
    return joined.where(mismatch).select(
        F.coalesce(F.col("bucket"), F.col("b_bucket")).alias("bucket"),
        "cnt_cur",
        "cnt_snap",
        "sum_cur",
        "sum_snap",
        "xor_cur",
        "xor_snap",
    )
