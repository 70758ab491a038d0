"""Property test (SURVEY.md §5.2 item 4): for ANY arrival order of a
versioned stream, the final dedup snapshot — and therefore the joined
result — is invariant. This is the correctness core of the whole
incremental-snapshot architecture."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st

from fink_joiner_spark.operators import dedup
from fink_joiner_spark.streaming.dedup_stream import SnapshotStore

# (key, version_ts, payload-id) events; duplicate (key, ts) allowed —
# tie-break must stay deterministic via the payload id.
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=1_000),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events, seed=st.integers(min_value=0, max_value=2**16))
def test_snapshot_invariant_under_arrival_order(spark, tmp_path_factory, rows, seed):
    schema = "k long, ts long, pid long"
    want_df = dedup.latest_per_key(
        spark.createDataFrame(rows, schema), ["k"], "ts", tie_breakers=["pid"]
    )
    want = sorted(tuple(r) for r in want_df.collect())

    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    store = SnapshotStore(
        str(tmp_path_factory.mktemp("snap")), ["k"], "ts", ["pid"]
    )
    # feed in arbitrary arrival order, arbitrary batch boundaries
    rng = random.Random(seed + 1)
    i = 0
    while i < len(shuffled):
        j = i + rng.randint(1, 5)
        store.upsert(spark.createDataFrame(shuffled[i:j], schema))
        i = j
    got = sorted(tuple(r) for r in store.read(spark).collect())
    assert got == want
