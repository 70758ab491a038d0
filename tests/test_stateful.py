"""Stateful streaming operator tests (M4): streaming as-of == batch
as-of under event-ordered arrival; running keyed reduce == batch fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import asof, aggregates
from fink_joiner_spark.sources.streaming import file_drip_feed
from fink_joiner_spark.streaming import stateful


def test_streaming_asof_matches_batch(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").withColumn("ts_s", F.col("ts").cast("double"))
    probe = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_s")
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts_s", F.col("event_id").alias("b_id")
    )

    tagged_batch = stateful.tag_streams(
        probe, build, on="user_id", probe_ts="ts_s", build_ts="ts_s", build_cols=["b_id"]
    )
    stream = file_drip_feed(spark, tagged_batch, str(tmp_path / "stage"), "ts", n_files=4)
    out = stateful.streaming_asof_join(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_raw = spark.sql("SELECT * FROM asof_stream")
    got = got_raw.select(
        F.get_json_object("probe_json", "$.event_id").cast("long").alias("event_id"),
        F.get_json_object("build_json", "$.b_id").cast("long").alias("b_id"),
    )
    want = asof.asof_join(
        probe, build, on="user_id", probe_ts="ts_s", build_ts="ts_s",
        build_cols=["b_id"], how="left",
    ).select("event_id", "b_id")

    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0


def test_streaming_asof_state_gc(spark, tmp_path):
    """Version-history GC keeps as-of answers correct: an old version
    beyond the retention horizon still answers probes (newest-older kept)."""
    probe = spark.createDataFrame([(1, 10_000.0)], "pid long, ts_s double") \
        .select(F.col("pid").alias("event_id"), F.lit(1).cast("long").alias("user_id"), "ts_s")
    build = spark.createDataFrame(
        [(1, 5.0, 101), (1, 6.0, 102)], "user_id long, ts_s double, b_id long"
    )
    tagged = stateful.tag_streams(
        probe, build, on="user_id", probe_ts="ts_s", build_ts="ts_s", build_cols=["b_id"]
    )
    stream = file_drip_feed(spark, tagged, str(tmp_path / "stage"), "ts", n_files=2)
    out = stateful.streaming_asof_join(stream, keep_versions_s=1.0)
    q = (
        out.writeStream.format("memory").queryName("asof_gc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM asof_gc").collect()
    assert len(rows) == 1
    assert '"b_id":102' in rows[0]["build_json"]


def test_streaming_keyed_reduce_matches_batch(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    sub = ev.filter(F.col("user_id") < 20).select(
        "user_id", "event_type", "ts", "event_id"
    )
    stream = file_drip_feed(spark, sub, str(tmp_path / "stage"), "ts", n_files=3)
    out = stateful.streaming_keyed_reduce(stream, "user_id", "event_type", ["ts", "event_id"], sep="|")
    q = (
        out.writeStream.format("memory").queryName("reduce_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    final = spark.sql(
        """SELECT k, reduced FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY n_items DESC) rn
             FROM reduce_stream) WHERE rn = 1"""
    )
    want = aggregates.keyed_ordered_concat(
        sub, ["user_id"], "event_type", ["ts", "event_id"], sep="|", alias="reduced"
    ).select(F.col("user_id").alias("k"), "reduced")
    g = sorted(tuple(r) for r in final.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0


def test_streaming_dedup_retract_changelog(spark, tmp_path):
    """Out-of-order + duplicate versions: superseded versions are
    retracted, stale arrivals ignored, replay == latest-per-key."""
    rows = [
        # (key, ts_us, seq, payload) drip order = list order (1 file each)
        (1, 100, 1, "a"),
        (1, 300, 3, "c"),   # supersedes a -> retract a, insert c
        (1, 200, 2, "b"),   # stale (ts < current): no output at all
        (2, 100, 1, "x"),
        (2, 100, 2, "y"),   # equal ts, higher seq wins -> retract x
    ]
    src = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "drip long, k long, ts_us long, seq long, payload string",
    )
    stream = file_drip_feed(spark, src, str(tmp_path / "stage"), "drip", n_files=5)
    out = stateful.streaming_dedup_retract(stream, "k", "ts_us", "seq", "payload")
    q = (
        out.writeStream.format("memory").queryName("tws_retract")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    log = [
        (r.k, r.ts_us, r.seq, r.payload, r.is_retract)
        for r in spark.sql(
            "SELECT * FROM tws_retract ORDER BY k, ts_us, seq, is_retract"
        ).collect()
    ]
    assert log == [
        (1, 100, 1, "a", False),
        (1, 100, 1, "a", True),
        (1, 300, 3, "c", False),
        (2, 100, 1, "x", False),
        (2, 100, 1, "x", True),
        (2, 100, 2, "y", False),
    ]
    snapshot = {
        (r.k, r.payload)
        for r in spark.sql(
            """SELECT k, payload FROM tws_retract GROUP BY k, ts_us, seq, payload
               HAVING SUM(CASE WHEN is_retract THEN -1 ELSE 1 END) > 0"""
        ).collect()
    }
    assert snapshot == {(1, "c"), (2, "y")}


def test_tws_gate_reflects_environment(spark):
    """The auto api picks the modern path only when protobuf exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        assert stateful.tws_available()
    except ImportError:
        assert not stateful.tws_available()
