"""As-of join (J3) semantics tests: window-plan vs range-join cross-check,
equal-timestamp visibility, and the canonical FIXTURES.md §5 tiny case."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import asof
from fink_joiner_spark.sources import batch as mem


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_window_plan_matches_rangejoin(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    build = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("b_id"))
    )
    a = asof.asof_join(probe, build, "user_id", "ts", "ts", ["b_id"], how="left")
    b = asof.asof_join_rangejoin(probe, build, "user_id", "ts", "ts", ["b_id"], how="left")
    assert _rows(a, "event_id", "b_id") == _rows(b, "event_id", "b_id")


def test_equal_ts_version_visible(spark):
    """A build version at exactly probe-ts must be joined (<= semantics,
    Flink temporal table function contract)."""
    probe = spark.createDataFrame([(1, 100), (1, 50)], "k long, ts long")
    build = spark.createDataFrame(
        [(1, 100, "v100"), (1, 60, "v60")], "k long, ts long, val string"
    )
    out = asof.asof_join(probe, build, "k", "ts", "ts", ["val"], how="left")
    got = {r["ts"]: r["val"] for r in out.collect()}
    assert got == {100: "v100", 50: None}


def test_fixture_listing_asof_image(spark):
    """FIXTURES.md §5: listings as-of images (FlinkJoiner static data).
    listing(1, ts=4m) sees Image 1.2 (3m); listing(2, ts=3m) sees
    Image 2.0 (3m, equal-ts); listing(3/4) see nothing."""
    t = mem.fixture_tables(spark)
    probe = t["listings"].select(F.col("id"), F.col("data"), F.col("ts_ms"))
    build = t["images"].select(
        F.col("id"), F.col("ts_ms"), F.col("data").alias("image")
    )
    out = asof.asof_join(probe, build, "id", "ts_ms", "ts_ms", ["image"], how="left")
    got = {(r["id"], r["ts_ms"]): r["image"] for r in out.collect()}
    assert got[(1, 240000)] == "Image 1.2"
    assert got[(2, 180000)] == "Image 2.0"  # equal-ts visibility
    assert got[(2, 600000)] == "Image 2.0"
    assert got[(3, 60000)] is None
    assert got[(4, 60000)] is None


def test_tolerance_bounds_staleness(spark):
    probe = spark.createDataFrame([(1, 1000.0)], "k long, ts double")
    build = spark.createDataFrame([(1, 10.0, "old")], "k long, ts double, val string")
    fresh = asof.asof_join(probe, build, "k", "ts", "ts", ["val"], how="left", tolerance=2000.0)
    stale = asof.asof_join(probe, build, "k", "ts", "ts", ["val"], how="left", tolerance=100.0)
    assert fresh.collect()[0]["val"] == "old"
    assert stale.collect()[0]["val"] is None


def test_asof_nearest_direction_and_ties(spark):
    from fink_joiner_spark.operators import asof

    probe = spark.createDataFrame(
        [(1, 100.0, "p1"), (1, 10.0, "p2"), (2, 50.0, "p3"), (3, 7.0, "p4")],
        "k long, ts double, pid string",
    )
    build = spark.createDataFrame(
        # k=1: versions at 90 and 105 -> p1(100) nearest fwd(105,d=5)? back d=10 -> fwd
        #      p2(10): only later versions exist -> forward match (90)
        # k=2: versions at 45 and 55 -> tie |5| -> backward (45)
        # k=3: no versions -> inner drops, left nulls
        [(1, 90.0, "b90"), (1, 105.0, "b105"), (2, 45.0, "b45"), (2, 55.0, "b55")],
        "k long, ts double, bid string",
    )
    inner = {
        r.pid: r.bid
        for r in asof.asof_join_nearest(
            probe, build, on="k", probe_ts="ts", build_ts="ts",
            build_cols=["bid"], how="inner",
        ).collect()
    }
    assert inner == {"p1": "b105", "p2": "b90", "p3": "b45"}
    left = {
        r.pid: r.bid
        for r in asof.asof_join_nearest(
            probe, build, on="k", probe_ts="ts", build_ts="ts",
            build_cols=["bid"], how="left",
        ).collect()
    }
    assert left == {"p1": "b105", "p2": "b90", "p3": "b45", "p4": None}


def test_cogrouped_asof_matches_declarative(spark, sf_dir):
    """The Arrow-batched cogroup implementation and the union-tag
    window plan must produce identical results (incl. self-as-of where
    both sides derive from the same relation — the attribute-id
    pruning trap)."""
    from pyspark.sql import functions as F

    from fink_joiner_spark.catalog import table
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    decl = asof.asof_join(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["err_id"], how="inner",
    )
    cog = asof.asof_join_cogrouped(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts", build_cols=["err_id"]
    )
    a = {(r["event_id"], r["err_id"]) for r in decl.collect()}
    b = {(r["event_id"], r["err_id"]) for r in cog.collect()}
    assert a == b and len(a) > 0


def test_cogrouped_asof_keeps_null_payload_matches(spark):
    """A matched build row whose payload column is NULL must survive
    the inner as-of (the unmatched marker is the merge key, not a
    payload column) — review finding."""
    from fink_joiner_spark.operators import asof

    p = spark.createDataFrame([(1, 10, 100)], "k long, ts long, event_id long")
    b = spark.createDataFrame([(1, 5, None)], "k long, ts long, payload string")
    out = asof.asof_join_cogrouped(
        p, b, on="k", probe_ts="ts", build_ts="ts", build_cols=["payload"]
    ).collect()
    assert len(out) == 1 and out[0]["payload"] is None
