"""Multi-writer coordination of the versioned store: the TTL writer
lease and CAS commit markers (round 9 — closes the r8 verdict's last
caveat, which had deferred two-writer races to a Delta/Iceberg
upgrade). Single-writer snapshot-isolation behavior (crash-before-
commit, mid-maintenance probes, GC grace) is covered index-level in
tests/test_lake.py; these tests drive the store directly."""

from __future__ import annotations

import time

import pytest

from fink_joiner_spark import versioned
from fink_joiner_spark.versioned import ConcurrentWriteError, VersionedStore


def _commit_one(spark, store, v, payload: int) -> None:
    spark.range(payload).write.parquet(f"{store.vdir(v)}/data")
    store.commit(v, [("data", "", v)])


@pytest.fixture()
def other_process(monkeypatch):
    """Make subsequently-constructed stores present as a DIFFERENT
    driver process (fresh process token), so lease contention is real
    instead of the same-process takeover path."""

    def switch():
        monkeypatch.setattr(versioned, "_PROCESS_TOKEN", "otherproc1234")

    return switch


def test_live_lease_blocks_second_writer(spark, tmp_path, other_process):
    root = str(tmp_path / "store")
    w1 = VersionedStore(spark, root)
    v = w1.begin()
    other_process()
    w2 = VersionedStore(spark, root)
    with pytest.raises(ConcurrentWriteError, match="lease .*held"):
        w2.begin()
    # the holder is unaffected and commits normally
    _commit_one(spark, w1, v, 3)
    assert w1.current() == v
    # lease released on commit: the other writer can now proceed
    assert w2.begin() == v + 1


def test_expired_lease_is_stolen_and_zombie_is_fenced(
    spark, tmp_path, other_process
):
    root = str(tmp_path / "store")
    zombie = VersionedStore(spark, root, lease_ttl_s=0.05)
    vz = zombie.begin()
    zombie.fs.mkdirs(f"{zombie.vdir(vz)}/data")  # zombie staged something
    time.sleep(0.15)  # lease expires while the zombie is "paused"

    other_process()
    stealer = VersionedStore(spark, root)
    vs = stealer.begin()
    # the stealer never reuses the zombie's staging dir
    assert vs == vz + 1
    _commit_one(spark, stealer, vs, 5)

    # the zombie wakes and tries to commit: fenced before the flip
    with pytest.raises(ConcurrentWriteError):
        _commit_one(spark, zombie, vz, 2)
    # the stealer's commit is the visible state
    assert stealer.current() == vs
    assert spark.read.parquet(f"{stealer.vdir(vs)}/data").count() == 5


def test_commit_marker_cas_refuses_existing_version(
    spark, tmp_path, other_process
):
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root)
    v = w.begin()
    # another writer (simulated) already committed this version number
    w.fs.mkdirs(f"{root}/_commits")
    assert w.fs.create_exclusive(f"{root}/_commits/c{v:06d}")
    with pytest.raises(ConcurrentWriteError, match="already exists"):
        _commit_one(spark, w, v, 2)
    # the loser released its lease — the next writer (any process)
    # proceeds immediately rather than waiting out the TTL
    other_process()
    assert VersionedStore(spark, root).begin() == v + 1


def test_gc_grace_is_configurable(spark, tmp_path):
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root, keep_commits=3)
    for payload in (2, 3, 4, 5):
        _commit_one(spark, w, w.begin(), payload)
    # last three commits' dirs survive; the first is collected
    names = set(w.fs.list_dirs(root))
    assert {"v000002", "v000003", "v000004"} <= names
    assert "v000001" not in names
    assert w.committed_versions() == [2, 3, 4]


def test_same_process_retry_takes_over_own_lease(spark, tmp_path):
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root)
    w.begin()  # op "crashes" here: lease file left behind
    retry = VersionedStore(spark, root)
    v = retry.begin()  # immediate takeover — no TTL wait
    _commit_one(spark, retry, v, 4)
    assert retry.current() == v


def test_unreadable_lock_ages_out_by_mtime(spark, tmp_path, other_process):
    """A crash can leave a partial (contentless) lock file; it must be
    treated as held until its mtime + TTL, then stolen — never a
    permanent deadlock."""
    root = str(tmp_path / "store")
    seed = VersionedStore(spark, root, lease_ttl_s=0.05)
    assert seed.fs.create_exclusive(f"{root}/_writer_lock", "")  # no content
    other_process()
    w = VersionedStore(spark, root, lease_ttl_s=0.05)
    time.sleep(0.15)
    v = w.begin()  # stolen via the mtime fallback
    _commit_one(spark, w, v, 2)
    assert w.current() == v


def test_lease_cycle_leaves_no_lock_debris(spark, tmp_path):
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root)
    v = w.begin()
    _commit_one(spark, w, v, 2)
    assert not w.fs.exists(f"{root}/_writer_lock")


def test_abort_releases_lease_and_drops_staging(spark, tmp_path):
    """A FAILED (not crashed) op must not lock other writers out for
    the TTL: the transaction wrapper aborts — staged dir dropped,
    lease released immediately (r9 ADVICE #3)."""
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root)
    with pytest.raises(RuntimeError, match="boom"):
        with w.transaction() as v:
            w.fs.mkdirs(f"{w.vdir(v)}/data")
            raise RuntimeError("boom")
    assert not w.fs.exists(f"{root}/_writer_lock")
    assert not w.fs.exists(w.vdir(v))
    # the next writer proceeds immediately
    w2 = VersionedStore(spark, root)
    v2 = w2.begin()
    _commit_one(spark, w2, v2, 2)
    assert w2.current() == v2


def test_manifest_cache_not_poisoned_by_lost_cas(spark, tmp_path):
    """When the commit-marker CAS loses, the loser must NOT cache its
    manifest for the version the WINNER committed (r9 ADVICE #2) —
    a poisoned cache would serve wrong index state / GC live data
    for the rest of the process."""
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root)
    v = w.begin()
    spark.range(3).write.parquet(f"{w.vdir(v)}/data")
    # the "winner": a marker for v with a DIFFERENT manifest landed
    w.fs.mkdirs(f"{root}/_commits")
    winner_rows = [["windata", "", v]]
    import json as _json

    w.fs.delete(f"{w.vdir(v)}/_state.json", recursive=False)
    assert w.fs.create_exclusive(f"{root}/_commits/c{v:06d}")
    with pytest.raises(ConcurrentWriteError):
        w.commit(v, [("data", "", v)])
    # overwrite the manifest file with the winner's content (simulating
    # the winner's staging) and verify state_rows serves THAT, not the
    # loser's cached rows
    w.fs.delete(f"{w.vdir(v)}/_state.json", recursive=False)
    assert w.fs.create_exclusive(
        f"{w.vdir(v)}/_state.json", _json.dumps(winner_rows)
    )
    assert w.state_rows(v) == [("windata", "", v)]


def test_time_travel_outside_grace_raises_clear_error(spark, tmp_path):
    """Probing a GC'd version must name the retention story (r9 ADVICE
    #4), not surface an obscure parquet PATH_NOT_FOUND."""
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root)  # keep_commits=2 default
    for payload in (2, 3, 4):
        _commit_one(spark, w, w.begin(), payload)
    # v1 fell outside the 2-commit grace window
    with pytest.raises(ValueError, match="garbage-collected.*keep_commits=2"):
        w.state_rows(1)
    # a never-committed future version reads as such
    with pytest.raises(ValueError, match="never committed"):
        w.state_rows(99)


def test_keep_commits_pins_time_travel_readers(spark, tmp_path):
    """The r9 verdict ask #7: a reader pinning version N−k stays
    readable across k maintenance flips when the store is constructed
    with keep_commits=k+1 — the documented sizing rule."""
    k = 2
    root = str(tmp_path / "store")
    w = VersionedStore(spark, root, keep_commits=k + 1)
    v_pin = w.begin()
    _commit_one(spark, w, v_pin, 7)
    for payload in (8, 9):  # k = 2 subsequent flips
        _commit_one(spark, w, w.begin(), payload)
    # the pinned version is still fully readable: manifest + data
    assert w.state_rows(v_pin) == [("data", "", v_pin)]
    assert w.read("data", version=v_pin).count() == 7
    # one more flip pushes it out of the window
    _commit_one(spark, w, w.begin(), 10)
    with pytest.raises(ValueError, match="garbage-collected"):
        w.state_rows(v_pin)


def test_lease_steal_rename_tombstone_no_double_hold(
    spark, tmp_path, other_process, monkeypatch
):
    """The r9 ADVICE #1 race: two processes both observing an expired
    lease must never BOTH believe they hold it. The fix makes the
    steal a rename-to-tombstone of the exact observed lock — simulate
    the loser's side: after the winner has already stolen and
    recreated, a stale-lease deletion attempt (the old unconditional
    delete) is now a failed rename, and the loser re-observes the
    winner's live lease instead of clobbering it."""
    root = str(tmp_path / "store")
    stale = VersionedStore(spark, root, lease_ttl_s=0.05)
    stale.begin()  # leaves a lease that will expire
    time.sleep(0.15)

    other_process()
    winner = VersionedStore(spark, root, lease_ttl_s=30)
    vw = winner.begin()  # steals the expired lease, holds a live one

    # a third process also saw the expired lease and races its steal
    monkeypatch.setattr(versioned, "_PROCESS_TOKEN", "thirdproc5678")
    loser = VersionedStore(spark, root, lease_ttl_s=30)
    with pytest.raises(ConcurrentWriteError, match="held"):
        loser.begin()
    # the winner's lease was never clobbered: it commits normally
    _commit_one(spark, winner, vw, 2)
    assert winner.current() == vw


def test_concurrent_writer_threads_one_wins_no_corruption(spark, tmp_path):
    """Two writer THREADS racing one store (the zombie-callback shape
    the kill-midrun test exposed): each uses its own VersionedStore
    instance; at most one commit per version number lands, losers get
    ConcurrentWriteError (never silent interleaving), staging dirs are
    never shared (begin()'s exclusive _staging marker), and the final
    committed state is exactly ONE writer's consistent dataset."""
    import threading

    root = str(tmp_path / "store")
    results: dict[str, str] = {}
    barrier = threading.Barrier(2)

    def writer(tag: str, payload: int) -> None:
        w = VersionedStore(spark, root, lease_ttl_s=30)
        barrier.wait()
        try:
            with w.transaction() as v:
                spark.range(payload).write.parquet(f"{w.vdir(v)}/data")
                w.commit(v, [("data", "", v), ("_tag", tag, v)])
            results[tag] = f"committed v{v}"
        except ConcurrentWriteError:
            results[tag] = "fenced"

    threads = [
        threading.Thread(target=writer, args=("a", 7)),
        threading.Thread(target=writer, args=("b", 11)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)

    outcomes = sorted(results.values())
    assert len(outcomes) == 2 and all(
        o.startswith(("committed", "fenced")) for o in outcomes
    ), outcomes
    # The contract is AT-MOST-one commit per version and fenced losers
    # with NO visible change — not at-least-one: same-process writers
    # may mutually steal (the takeover path exists for crash retry)
    # and both fence, which is exactly the wanted zombie behavior. A
    # fenced writer's retry must then succeed outright.
    reader = VersionedStore(spark, root)
    if reader.current() is None:
        assert outcomes == ["fenced", "fenced"], outcomes
        # the mutual-steal mess can leave lock debris (even a
        # contentless lock, if a rename raced a content write): the
        # convergence contract is that a retry succeeds once the
        # debris ages out of ITS OWN short TTL — never a deadlock
        deadline = time.time() + 30
        while True:
            retry = VersionedStore(spark, root, lease_ttl_s=0.5)
            try:
                with retry.transaction() as v:
                    spark.range(7).write.parquet(f"{retry.vdir(v)}/data")
                    retry.commit(v, [("data", "", v), ("_tag", "a", v)])
                break
            except ConcurrentWriteError:
                assert time.time() < deadline, "retry never converged"
                time.sleep(0.2)
        reader = VersionedStore(spark, root)

    # every committed version's manifest references a dataset whose
    # rows exist and match ONE writer exactly (no mixed staging, no
    # torn manifests)
    assert reader.current() is not None
    for v in reader.committed_versions():
        t = reader.annotation("_tag", v)
        cnt = reader.read("data", version=v).count()
        assert (t, cnt) in {("a", 7), ("b", 11)}, (v, t, cnt, outcomes)


def test_lease_steal_wrong_incarnation_restores_live_lock(
    spark, tmp_path, other_process, monkeypatch
):
    """ADVICE r10 #1: rename is path-conditional, not identity-
    conditional. Between a loser's _read_lock (expired observation)
    and its rename, a winner can complete a FULL steal (tombstone +
    fresh live lock) — the loser's rename then grabs the winner's
    LIVE lease. The fix verifies the tombstone's identity after the
    rename: a live foreign token means wrong incarnation — restore it
    and re-observe (raise). The winner's lease must survive the whole
    episode, so it never gets fenced mid-op."""
    root = str(tmp_path / "store")
    stale = VersionedStore(spark, root, lease_ttl_s=0.05)
    stale.begin()
    time.sleep(0.15)

    other_process()
    winner = VersionedStore(spark, root, lease_ttl_s=30)
    vw = winner.begin()  # full steal: lock path now holds a LIVE lease

    # loser (third process) whose OBSERVATION is the stale pre-steal
    # lock: feed it the expired reading once, then the real file
    monkeypatch.setattr(versioned, "_PROCESS_TOKEN", "thirdproc9999")
    loser = VersionedStore(spark, root, lease_ttl_s=30)
    real_read = loser._read_lock
    calls = {"n": 0}

    def stale_first_read():
        calls["n"] += 1
        if calls["n"] == 1:
            return ("deadproc-feedbeef", 1)  # expired long ago
        return real_read()

    monkeypatch.setattr(loser, "_read_lock", stale_first_read)
    with pytest.raises(ConcurrentWriteError, match="held"):
        loser.begin()
    assert calls["n"] >= 2  # it re-observed instead of clobbering

    # the winner's live lease was restored, not deleted: commit-time
    # _verify_lease passes and the commit lands
    _commit_one(spark, winner, vw, 2)
    assert winner.current() == vw
    # no tombstone debris left behind
    import os as _os
    debris = [n for n in _os.listdir(root) if ".tomb." in n]
    assert debris == []
