"""Unit tests for z-set incremental join maintenance (delta_join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark import plans
from fink_joiner_spark.operators import incremental


def _z(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_delta_join_equals_full_recompute(spark):
    a = _z(spark, [(1, "x", 1), (2, "y", 1)], "k long, pa string, mult long")
    da = _z(
        spark,
        [(2, "y", -1), (3, "z", 1)],  # retract (2,y), insert (3,z)
        "k long, pa string, mult long",
    )
    b = _z(spark, [(1, "B1", 1), (2, "B2", 1), (3, "B3", 1)], "k long, pb string, mult long")
    db = _z(
        spark,
        [(1, "B1", -1), (1, "B1v2", 1)],  # update k=1's payload
        "k long, pb string, mult long",
    )
    dv = incremental.delta_join(a, da, b, db, on="k")
    v_old = (
        a.withColumnRenamed("mult", "_ml")
        .join(b.withColumnRenamed("mult", "_mr"), "k")
        .withColumn("mult", F.col("_ml") * F.col("_mr"))
        .drop("_ml", "_mr")
    )
    got = {
        (r["k"], r["pa"], r["pb"], r["mult"])
        for r in incremental.z_normalize(v_old.unionByName(dv)).collect()
    }
    # full recompute: A_new = {(1,x),(3,z)}, B_new = {(1,B1v2),(2,B2),(3,B3)}
    assert got == {(1, "x", "B1v2", 1), (3, "z", "B3", 1)}


def test_delta_join_double_retraction_cancels(spark):
    # retracting a row twice then re-inserting once nets -1 ... +1 = 0
    # paired rows vanish from the normalized view (no clamping, z-set law)
    a = _z(spark, [(1, "x", 1)], "k long, pa string, mult long")
    da = _z(spark, [(1, "x", -1)], "k long, pa string, mult long")
    b = _z(spark, [(1, "B", 1)], "k long, pb string, mult long")
    db = spark.createDataFrame([], "k long, pb string, mult long")
    dv = incremental.delta_join(a, da, b, db, on="k")
    v_old = (
        a.withColumnRenamed("mult", "_ml")
        .join(b.withColumnRenamed("mult", "_mr"), "k")
        .withColumn("mult", F.col("_ml") * F.col("_mr"))
        .drop("_ml", "_mr")
    )
    assert incremental.z_normalize(v_old.unionByName(dv)).count() == 0


def test_delta_join_broadcasts_deltas_not_bases(spark):
    # every bilinear term must probe a broadcast DELTA; the base
    # relations stay put (the O(delta) refresh-cost contract)
    a = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("a").alias("pa"), F.lit(1).cast("long").alias("mult")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("b").alias("pb"), F.lit(1).cast("long").alias("mult")
    )
    da = a.where("k < 3")
    db = b.where("k < 3")
    dv = incremental.delta_join(a, da, b, db, on="k")
    plan = plans.formatted_plan(dv)
    # tree labels only (each node appears again in the detail section)
    assert plan.count("BroadcastHashJoin Inner") == 3  # one per term
    assert plans.count_shuffles(dv) == 0  # bases never move
