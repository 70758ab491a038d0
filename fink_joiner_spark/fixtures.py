"""Fixture-build amortization for self-contained index demos
(r10 verdict ask #8).

The index-lifecycle queries are deliberately self-contained: each call
builds the index pre-state it operates on (by construction — the
driver contract gives a query only (spark, sf_dir)). Under the bench's
3-reps-per-query protocol that setup re-runs per rep: ~40% of the r10
round's wall time was fixture rebuilds (fixture_build_sec = 201 s),
measuring the SETUP twice more instead of the operator.

:func:`fixture_dir` is the seam. Default behavior is byte-identical
to the old inline code — a fresh ``mkdtemp`` and a setup run per call
(pytest and the correctness driver see NO caching; every proof still
builds its own state). When the bench sets ``SPARK_GRAFT_FIXTURE_CACHE``
to a directory, the setup result is cached keyed by
``(query fixture name, sf_dir, code tree hash)`` and each call gets a
FRESH COPY of the cached directory — so mutating maintenance ops (the
operator under test) still run on private state every rep, while the
pre-state build runs once per round. The code tree hash covers every
``.py`` under ``fink_joiner_spark/``: editing any operator invalidates
all cached fixtures, so a stale cache can never mask a code change
(the "keyed by tree-hash" half of the verdict ask).

Only valid for LOCAL-filesystem fixture stores (``shutil`` copy); the
versioned store's manifests reference dataset-relative paths, so a
copied tree is a fully valid store at its new root (pinned by
``tests/test_fixture_cache.py``).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable
from pathlib import Path

_CODE_HASH: str | None = None


def code_tree_hash() -> str:
    """Stable hash of every .py file under fink_joiner_spark/ —
    computed once per process (~20k LoC, a few ms)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        root = Path(__file__).parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def fixture_dir(name: str, setup: Callable[[str], None], sf_dir: str = "") -> str:
    """A work directory holding the fixture ``setup`` produces.

    * no ``SPARK_GRAFT_FIXTURE_CACHE`` in the environment (pytest, the
      correctness driver): fresh ``mkdtemp`` + ``setup(work)`` — the
      historical behavior, no cache anywhere;
    * cache enabled (the bench): build once per
      ``(name, sf_dir, code_tree_hash)`` into the cache, then hand out
      a fresh private COPY per call, so per-rep mutations never leak
      between reps and reruns measure the operator, not the setup.
    """
    cache_root = os.environ.get("SPARK_GRAFT_FIXTURE_CACHE")
    if not cache_root:
        work = tempfile.mkdtemp(prefix=f"fjs_{name}_")
        setup(work)
        return work
    key = hashlib.sha256(
        f"{name}|{sf_dir}|{code_tree_hash()}".encode()
    ).hexdigest()[:24]
    slot = os.path.join(cache_root, f"{name}.{key}")
    done = os.path.join(slot, "_FIXTURE_DONE")
    if not os.path.exists(done):
        # single-process protocol (the bench is one process; a crashed
        # partial build leaves no _FIXTURE_DONE and is rebuilt)
        if os.path.exists(slot):
            shutil.rmtree(slot)
        staging = slot + ".building"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        os.makedirs(staging, exist_ok=True)
        setup(staging)
        Path(os.path.join(staging, "_FIXTURE_DONE")).touch()
        os.rename(staging, slot)  # slot was cleared above; atomic dir move
    work = tempfile.mkdtemp(prefix=f"fjs_{name}_")
    # copy INTO the fresh dir (the store layout sits at the dir root)
    for entry in os.listdir(slot):
        if entry == "_FIXTURE_DONE":
            continue
        src = os.path.join(slot, entry)
        dst = os.path.join(work, entry)
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
    return work
