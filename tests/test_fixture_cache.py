"""Fixture-build amortization seam (r10 verdict ask #8).

Pins the contract fixtures.fixture_dir gives the bench: setup runs
once per (name, sf, code tree hash), every call gets a PRIVATE fresh
copy, and a copied versioned store is fully valid at its new root —
so per-rep maintenance mutations (the operator under test) can never
leak between reps, and correctness runs (no env var) keep the
historical build-per-call behavior byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fink_joiner_spark import fixtures


def test_no_env_means_no_cache(monkeypatch, tmp_path):
    monkeypatch.delenv("SPARK_GRAFT_FIXTURE_CACHE", raising=False)
    calls = []

    def setup(w):
        calls.append(w)
        open(os.path.join(w, "x"), "w").write("1")

    a = fixtures.fixture_dir("t1", setup)
    b = fixtures.fixture_dir("t1", setup)
    assert len(calls) == 2 and a != b  # build per call, private dirs


def test_cache_builds_once_and_hands_out_private_copies(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_CACHE", str(tmp_path / "cache"))
    os.makedirs(str(tmp_path / "cache"), exist_ok=True)
    calls = []

    def setup(w):
        calls.append(w)
        os.makedirs(os.path.join(w, "sub"))
        open(os.path.join(w, "sub", "data"), "w").write("payload")

    a = fixtures.fixture_dir("t2", setup, "sfX")
    b = fixtures.fixture_dir("t2", setup, "sfX")
    assert len(calls) == 1  # amortized
    assert a != b
    assert open(os.path.join(b, "sub", "data")).read() == "payload"
    # mutations stay private per copy
    open(os.path.join(a, "sub", "data"), "w").write("mutated")
    assert open(os.path.join(b, "sub", "data")).read() == "payload"
    # no cache bookkeeping leaks into the handed-out copy
    assert not os.path.exists(os.path.join(b, "_FIXTURE_DONE"))
    # different sf or different fixture name = different cache slot
    fixtures.fixture_dir("t2", setup, "sfY")
    assert len(calls) == 2


def test_fixture_key_invalidation_contract(monkeypatch, tmp_path):
    """r12 verdict ask #2: the key covers the setup RECIPE + the engine
    builder modules — not the whole code tree. Pins all four edges:
    builder-module change invalidates; setup-source change invalidates;
    an UNRELATED code-tree change does NOT (that's what makes the
    persistent cache pay); superseded same-name slots are pruned."""
    cache = tmp_path / "cache"
    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_CACHE", str(cache))
    os.makedirs(str(cache), exist_ok=True)
    calls = []

    def setup(w):
        calls.append(w)
        open(os.path.join(w, "x"), "w").write("1")

    fixtures.fixture_dir("t3", setup, "sf")
    assert len(calls) == 1
    # unrelated tree change: key unchanged, cache HIT
    monkeypatch.setattr(fixtures, "_CODE_HASH", "deadbeef00000000")
    fixtures.fixture_dir("t3", setup, "sf")
    assert len(calls) == 1, "unrelated commits must not invalidate"
    # builder-module change: key changes, rebuild
    monkeypatch.setattr(fixtures, "_MODULES_HASH", "feedface00000000")
    fixtures.fixture_dir("t3", setup, "sf")
    assert len(calls) == 2, "an engine-module change must invalidate"
    # superseded slot pruned: exactly one t3.* slot remains
    slots = [e for e in os.listdir(str(cache)) if e.startswith("t3.")]
    assert len(slots) == 1, slots
    # setup-source change (a different recipe): rebuild

    def setup(w):  # noqa: F811 — deliberately different body
        calls.append(w)
        open(os.path.join(w, "x"), "w").write("2")

    fixtures.fixture_dir("t3", setup, "sf")
    assert len(calls) == 3, "a recipe change must invalidate"


def test_fixture_key_fallback_without_source(monkeypatch, tmp_path):
    """Setups whose source inspect can't read fall back to the
    conservative whole-tree hash — never a stale hit."""
    import functools

    cache = tmp_path / "cache"
    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_CACHE", str(cache))
    os.makedirs(str(cache), exist_ok=True)
    calls = []

    def raw(tag, w):
        calls.append(w)
        open(os.path.join(w, "x"), "w").write(tag)

    setup = functools.partial(raw, "a")
    fixtures.fixture_dir("t5", setup, "sf")
    fixtures.fixture_dir("t5", setup, "sf")
    assert len(calls) == 1  # cache hit under the fallback key
    monkeypatch.setattr(fixtures, "_CODE_HASH", "deadbeef00000000")
    fixtures.fixture_dir("t5", setup, "sf")
    assert len(calls) == 2, "tree change must invalidate the fallback key"


def test_copied_versioned_store_is_valid_at_new_root(
    spark, monkeypatch, tmp_path
):
    """The load-bearing property: a copied store tree (manifests hold
    dataset-RELATIVE paths) probes identically at its new root, and a
    maintenance op on the copy leaves the cached original untouched."""
    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_CACHE", str(tmp_path / "cache"))
    os.makedirs(str(tmp_path / "cache"), exist_ok=True)

    from fink_joiner_spark.operators import scoring

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(40)],
        "doc_id long, text string",
    )

    def setup(w):
        scoring.build_bm25_index(
            docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text", w, n_buckets=4
        )

    a = fixtures.fixture_dir("t4_bm25", setup, "sf")
    b = fixtures.fixture_dir("t4_bm25", setup, "sf")
    probe_a = scoring.bm25_indexed_scores(spark, a, ["alpha"]).collect()
    assert len(probe_a) == 20
    # mutate copy b (the operator under test in a real rep)
    scoring.update_bm25_index(
        docs.where(F.col("doc_id") % 2 == 1), "doc_id", "text", b
    )
    assert len(scoring.bm25_indexed_scores(spark, b, ["alpha"]).collect()) == 40
    # copy a and a THIRD copy still see the unmutated pre-state
    c = fixtures.fixture_dir("t4_bm25", setup, "sf")
    assert len(scoring.bm25_indexed_scores(spark, a, ["alpha"]).collect()) == 20
    assert len(scoring.bm25_indexed_scores(spark, c, ["alpha"]).collect()) == 20
