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


def test_salted_join_rejects_build_replicating_how(spark):
    import pytest

    probe = spark.createDataFrame([(1, "x")], "k long, v string")
    build = spark.createDataFrame([(1, "d")], "k long, d string")
    for how in ("right", "full", "full_outer", "cross"):
        with pytest.raises(ValueError, match="probe-preserving"):
            skew.salted_join(probe, build, "k", how=how)
