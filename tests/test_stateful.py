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
