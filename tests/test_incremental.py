"""Incremental aggregate maintenance: merge == recompute, retraction
support, and the bucketed-state refresh plan (state never re-shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark import plans
from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import incremental, skew


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_recompute_any_batch_order(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    full = incremental.finalize(
        incremental.partial_agg(ev, ["user_id"], "value"), ["user_id"]
    )
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for order in ((0, 1, 2), (2, 0, 1)):
        state = incremental.partial_agg(parts[order[0]], ["user_id"], "value")
        for i in order[1:]:
            state = incremental.merge_states(
                state, incremental.partial_agg(parts[i], ["user_id"], "value"),
                ["user_id"],
            )
        assert _rows(incremental.finalize(state, ["user_id"])) == _rows(full)


def test_negative_delta_retracts_counts_and_sums(spark):
    rows = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    state = incremental.partial_agg(rows, ["k"], "v")
    # retract (1, 20.0): negative partial
    retract = incremental.partial_agg(
        spark.createDataFrame([(1, 20.0)], "k long, v double"), ["k"], "v"
    ).select(
        "k", (-F.col("n")).alias("n"), (-F.col("sum_cents")).alias("sum_cents"),
        "min_v", "max_v",
    )
    merged = incremental.merge_states(state, retract, ["k"]).filter("k = 1")
    got = merged.select("n", "sum_cents").collect()[0]
    assert (got["n"], got["sum_cents"]) == (1, 1000)


def test_bucketed_state_refresh_does_not_shuffle_state(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = incremental.partial_agg(
        ev.filter(F.col("event_id") % 10 < 8), ["user_id"], "value"
    )
    skew.write_bucketed(base, "agg_state_b", "user_id", 8)
    state = skew.read_bucketed(spark, "agg_state_b")
    delta = incremental.partial_agg(
        ev.filter(F.col("event_id") % 10 >= 8), ["user_id"], "value"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = incremental.merge_states(state, delta, ["user_id"])
        # delta path: its own partial agg + re-bucket to the state's
        # partitioning = 2 exchanges; the bucketed state contributes NONE
        assert plans.count_shuffles(merged) <= 2, plans.formatted_plan(merged)
        plan = plans.formatted_plan(merged)
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS agg_state_b")
