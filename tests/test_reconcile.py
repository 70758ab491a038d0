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
