"""Skew/shuffle management: salted join equivalence + bucketed
co-located joins eliminating exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark import plans
from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import skew


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey", "inner").select("o_orderkey", "c_name")
    salted = skew.salted_join(orders, customer, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b and len(a) > 0


def test_salted_join_left_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, "x"), (99, "y")], "k long, v string")
    build = spark.createDataFrame([(1, "dim1")], "k long, d string")
    out = skew.salted_join(probe, build, "k", n_salts=4, how="left")
    got = {r.v: r.d for r in out.collect()}
    assert got == {"x": "dim1", "y": None}


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # default warehouse dir (spark-warehouse/, gitignored); tables dropped below
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    skew.write_bucketed(orders, "orders_b", "o_custkey", 8)
    skew.write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8
    )
    o = skew.read_bucketed(spark, "orders_b")
    c = skew.read_bucketed(spark, "customer_b")
    # disable broadcast so the co-located sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, "o_custkey", "inner").select("o_orderkey", "c_name")
        assert plans.count_shuffles(joined) == 0, plans.formatted_plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def _skewed_events(spark, n=200_000, n_cold_keys=500):
    """90% of rows share join key 0 (the hot entity); the rest spread
    over ``n_cold_keys`` keys. ``eid`` has duplicates (dedup input);
    payload is incompressible so shuffle-byte stats reflect row counts."""
    return spark.range(n).select(
        (F.col("id") % (n * 3 // 4)).alias("eid"),
        F.col("id").alias("ver"),
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % n_cold_keys + 1)
        .alias("k"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
        ).alias("payload"),
    )


def _dim(spark, n_keys=501):
    return spark.range(n_keys).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("d")
    )


def test_salted_join_spreads_hot_key(spark):
    """100 TB survival kit, salting half: on a 90%-hot key the plain
    hash partitioning sends ~all probe rows to ONE reducer; salting
    spreads them ~uniformly (max reducer load drops ≥4×) while the
    dedup→join pipeline's result is unchanged."""
    from fink_joiner_spark.operators import dedup

    ev = _skewed_events(spark)
    deduped = dedup.latest_per_key(ev, ["eid"], "ver")
    dim = _dim(spark)

    plain = deduped.join(dim, "k", "inner").select("eid", "ver", "d")
    salted = skew.salted_join(deduped, dim, "k", n_salts=8).select("eid", "ver", "d")
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b and len(a) > 0

    # reducer-load audit: rows per partition under the join's hash
    # partitioning, unsalted vs salted (same salt expression as
    # salted_join:52 — hash of the full row spread over n_salts).
    # reducers > salts so (k, salt) hash collisions don't re-fuse the
    # spread combos (8 combos over 8 reducers re-collide ~2-3 deep)
    n_part, n_salts = 64, 16
    def max_load(df, *cols):
        loads = (
            df.repartition(n_part, *[F.col(c) for c in cols])
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )
        return max(r["count"] for r in loads)

    salted_probe = deduped.withColumn(
        "__salt", F.abs(F.xxhash64(*deduped.columns)) % n_salts
    )
    hot = max_load(deduped, "k")
    spread = max_load(salted_probe, "k", "__salt")
    assert hot > 0.8 * deduped.count(), "fixture lost its skew"
    assert spread * 4 <= hot, f"salting spread {hot} -> {spread}, expected >=4x"


def test_aqe_skew_split_keeps_join_flat(spark):
    """100 TB survival kit, AQE half: with skew-join splitting enabled
    the hot partition is split at runtime — the final adaptive plan
    carries SortMergeJoin(skew=true) / 'skewed' shuffle reads — and the
    answer matches the AQE-off run. This is the zero-code-change path;
    salted_join is the pinned-plan fallback."""
    from fink_joiner_spark.queries import scoped_conf

    ev = _skewed_events(spark)
    dim = _dim(spark)
    # max(payload) keeps the wide column flowing through the probe-side
    # shuffle — column pruning would otherwise shrink the hot partition
    # below any skew threshold (and hide the very skew being tested)
    def run():
        return (
            ev.join(dim, "k", "inner")
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("cnt"), F.max("payload").alias("mp"))
        )

    with scoped_conf(spark, "spark.sql.adaptive.enabled", "false"):
        want = sorted(tuple(r) for r in run().collect())

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # local-test thresholds: the defaults (256 MB) are sized for
        # production shuffles; the *mechanism* is what's under test
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "512KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    from contextlib import ExitStack

    with ExitStack() as stack:
        for key, value in confs.items():
            stack.enter_context(scoped_conf(spark, key, value))
        q = run()
        plan = plans.formatted_plan(q, final=True)
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan, plan
        got = sorted(tuple(r) for r in q.collect())
    assert got == want and len(got) == ev.select("k").distinct().count()


def test_salted_join_rejects_build_replicating_how(spark):
    import pytest

    probe = spark.createDataFrame([(1, "x")], "k long, v string")
    build = spark.createDataFrame([(1, "d")], "k long, d string")
    for how in ("right", "full", "full_outer", "cross"):
        with pytest.raises(ValueError, match="probe-preserving"):
            skew.salted_join(probe, build, "k", how=how)
