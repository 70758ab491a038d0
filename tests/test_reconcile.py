from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.operators import reconcile


def _digest(df, n_buckets=8):
    sig = reconcile.row_signature([(F.col("k"), 8191), (F.col("v"), 7)])
    return reconcile.bucket_digest(df, F.col("k"), sig, n_buckets=n_buckets)


def test_identical_tables_diff_empty(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("v")
    )
    assert reconcile.digest_diff(_digest(df), _digest(df)).count() == 0


def test_digest_is_order_independent(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("v")
    )
    shuffled = df.orderBy(F.reverse(F.col("k").cast("string"))).repartition(7)
    assert reconcile.digest_diff(_digest(df), _digest(shuffled)).count() == 0


def test_single_mutation_hits_exactly_its_bucket(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("v")
    )
    mutated = df.withColumn(
        "v", F.when(F.col("k") == 123, F.col("v") + 1).otherwise(F.col("v"))
    )
    diff = reconcile.digest_diff(_digest(df), _digest(mutated)).collect()
    assert [r["bucket"] for r in diff] == [123 % 8]
    row = diff[0]
    # count unchanged, both checksums moved
    assert row["cnt_cur"] == row["cnt_snap"]
    assert row["sum_cur"] != row["sum_snap"]
    assert row["xor_cur"] != row["xor_snap"]


def test_deleted_bucket_reported_null_safe(spark):
    df = spark.range(0, 64).select(
        F.col("id").alias("k"), (F.col("id") + 10).alias("v")
    )
    # delete EVERY row of bucket 3 (k % 8 == 3) — the snapshot digest
    # has no row for that bucket; eqNullSafe must still report it
    snap = df.where(F.col("k") % 8 != 3)
    diff = reconcile.digest_diff(_digest(df), _digest(snap)).collect()
    assert [r["bucket"] for r in diff] == [3]
    assert diff[0]["cnt_snap"] is None


def test_offsetting_mutation_caught_by_xor(spark):
    # +1 on one row and -1 on another row of the SAME bucket cancels in
    # SUM; the XOR digest still catches it (signatures differ).
    df = spark.range(0, 64).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )
    mutated = df.withColumn(
        "v",
        F.when(F.col("k") == 2, F.col("v") + 1)
        .when(F.col("k") == 10, F.col("v") - 1)
        .otherwise(F.col("v")),
    )
    diff = reconcile.digest_diff(_digest(df), _digest(mutated)).collect()
    assert [r["bucket"] for r in diff] == [2]
    row = diff[0]
    assert row["sum_cur"] == row["sum_snap"]
    assert row["xor_cur"] != row["xor_snap"]


def test_null_column_mutation_is_visible(spark):
    """A row whose signature column is NULL must still contribute a
    signature (sentinel residue SIG_MOD): NULL-ing a value, or
    un-NULL-ing it to 0, must flip the digest. Pre-round-5 both edits
    were invisible (NULL sig rows were skipped by SUM and BIT_XOR)."""
    base = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k long, v long"
    )
    # mutation A: a NULL becomes 0 (the exact case the sentinel separates)
    mut_a = spark.createDataFrame([(1, 10), (2, 0), (3, 30)], "k long, v long")
    # mutation B: a value becomes NULL
    mut_b = spark.createDataFrame([(1, None), (2, None), (3, 30)], "k long, v long")
    assert reconcile.digest_diff(_digest(base), _digest(mut_a)).count() > 0
    assert reconcile.digest_diff(_digest(base), _digest(mut_b)).count() > 0
    assert reconcile.digest_diff(_digest(base), _digest(base)).count() == 0


def test_sum_checksum_no_overflow_at_max_signature(spark):
    """Digest must not throw under ANSI mode even when every row carries
    the maximum-magnitude signature (the pre-round-5 int64 SUM overflow
    at ~2^30 rows/bucket, scaled down: 2^33-sized sigs times enough
    rows to pass 2^63 would need billions — instead pin the DECIMAL
    path directly with values near long-max-scale)."""
    # per-row sig ≈ 4.9e13; 200k rows in ONE bucket sums to ≈ 9.8e18,
    # past int64's 9.22e18 — the old F.sum(long) raised
    # ArithmeticException under ANSI; the decimal sum + mod-2^61 must
    # return a normal in-range digest
    df = spark.range(0, 200_000).select(
        F.col("id").alias("k"),
        (F.lit((reconcile.SIG_MOD - 1) * 8191).cast("long") * 6000).alias("sigv"),
    )
    out = reconcile.bucket_digest(df, F.col("k"), F.col("sigv"), n_buckets=1).collect()
    assert len(out) == 1 and 0 <= out[0]["sig_sum"] < (1 << 61)
