"""Engine CLI assembly tests (SURVEY.md §2.7 argument surface)."""

from __future__ import annotations

import pytest

from fink_joiner_spark import engine
from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import dedup


def test_file_mode_runs_pipeline(spark, sf_dir, tmp_path):
    store = engine.run(
        [
            "--mode", "file",
            "--state-path", str(tmp_path / "state"),
            "--events-parquet", f"{sf_dir}/events.parquet",
        ],
        spark=spark,
    )
    snap = store.read(spark)
    ev = table(spark, sf_dir, "events")
    want = dedup.latest_per_key(ev, ["user_id"], "ts", ["event_id"])
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, want.collect()))


def test_missing_required_args_fail_cleanly(spark, tmp_path):
    with pytest.raises(SystemExit):
        engine.run(["--mode", "file", "--state-path", str(tmp_path)], spark=spark)
    with pytest.raises(SystemExit):
        engine.run(["--mode", "kafka", "--state-path", str(tmp_path)], spark=spark)
    with pytest.raises(SystemExit):
        engine.run([])  # --state-path required
