"""Semantics tests for the CDC operators (SCD-2 compaction, MERGE
upsert) and the PageRank step, on hand-built frames where the expected
output is computable by eye."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fink_joiner_spark.operators import cdc, graph


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_scd2_compact_collapses_consecutive_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0), "a"),
            (1, _ts(1), "a"),  # repeat -> collapsed into the first interval
            (1, _ts(2), "b"),
            (1, _ts(3), "a"),  # back to 'a' -> NEW interval (not merged)
            (2, _ts(5), "x"),
        ],
        "k long, ts timestamp, state string",
    )
    out = cdc.scd2_compact(df, ["k"], ["ts"], "state").orderBy("k", "version")
    rows = [(r.k, r.state, r.valid_from, r.valid_to, r.version) for r in out.collect()]
    assert rows == [
        (1, "a", _ts(0), _ts(2), 1),
        (1, "b", _ts(2), _ts(3), 2),
        (1, "a", _ts(3), None, 3),
        (2, "x", _ts(5), None, 1),
    ]


def test_scd2_single_shuffle(spark):
    """Both window passes share the key partitioning: exactly one
    Exchange in the physical plan."""
    df = spark.createDataFrame(
        [(1, _ts(0), "a")], "k long, ts timestamp, state string"
    )
    plan = cdc.scd2_compact(df, ["k"], ["ts"], "state")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_merge_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "one", 10.0), (2, "two", 20.0), (3, "three", 30.0)],
        "id long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [(2, "U", 99.0), (3, "D", None), (4, "U", 40.0)],
        "id long, op string, bal double",
    )
    out = cdc.merge_upsert(base, changes, ["id"]).orderBy("id")
    rows = [(r.id, r.name, r.bal) for r in out.collect()]
    assert rows == [
        (1, "one", 10.0),   # untouched
        (2, "two", 99.0),   # update: overlap col overwritten, name kept
        (4, None, 40.0),    # insert: base-only col is NULL
    ]  # id=3 deleted


def test_merge_upsert_broadcast_pins_no_base_shuffle(spark):
    base = spark.createDataFrame([(1, 1.0)], "id long, bal double")
    changes = spark.createDataFrame([(1, "U", 2.0)], "id long, op string, bal double")
    plan = (
        cdc.merge_upsert(base, changes, ["id"], broadcast_changes=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_pagerank_step_hand_computed(spark):
    # a -> b (w=1), b -> a (w=1): symmetric 2-cycle, uniform stays fixed
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], "src string, dst string, weight double"
    )
    out = {r.node: r.pr for r in graph.pagerank_step(edges).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_step_sink_gets_teleport_only(spark):
    # a -> b only: a has no in-edges -> teleport term (1-d)/n = 0.075;
    # b receives all of a's rank: 0.075 + 0.85 * 0.5 = 0.5
    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    out = {r.node: r.pr for r in graph.pagerank_step(edges).collect()}
    assert out["a"] == 0.075
    assert out["b"] == 0.5


def test_pagerank_weighted_split(spark):
    # a -> b (3), a -> c (1): b gets 3/4 of a's rank mass, c gets 1/4.
    # n=3, pr0=1/3, d=0.85: b = 0.05 + 0.85*(0.25) = 0.2625 (w/out=0.75
    # -> contrib 0.25); c = 0.05 + 0.85*(1/12) ~= 0.120833
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0)], "src string, dst string, weight double"
    )
    out = {r.node: r.pr for r in graph.pagerank_step(edges).collect()}
    assert out["a"] == 0.05
    assert out["b"] == 0.2625
    assert abs(out["c"] - 0.120833) < 1e-6
