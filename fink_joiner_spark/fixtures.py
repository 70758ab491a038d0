"""Fixture-build amortization for self-contained index demos
(r10 verdict ask #8; cache keying narrowed r13 per the r12 verdict).

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
to a directory, the setup result is cached and each call gets a FRESH
COPY of the cached directory — so mutating maintenance ops (the
operator under test) still run on private state every rep, while the
pre-state build runs once.

Cache key (r12 verdict ask #2 — the old whole-code-tree hash meant ANY
commit rebuilt every fixture, 210.9 s of the r12 bench): the key now
covers exactly what determines the fixture's bytes —

* the SOURCE of the setup callable itself (``inspect.getsource``), so
  editing a fixture's construction recipe rebuilds that fixture;
* the builder modules every index fixture funnels through
  (:data:`FIXTURE_BUILD_MODULES`: similarity / scoring / versioned /
  fsutil), so an engine change under the recipes rebuilds everything;
* ``name`` and ``sf_dir``.

Unrelated commits (bench.py, text.py, a test) no longer invalidate
anything, which is what makes a PERSISTENT cache dir pay: bench.py now
defaults the cache to a stable /tmp location that survives across runs
(see bench.py). Stale same-name slots from older code are pruned when
a new key builds, bounding the cache to one slot per fixture name.
If ``inspect.getsource`` is unavailable for a setup (exotic callables),
the key falls back to the whole-tree hash — conservative, never stale.

Only valid for LOCAL-filesystem fixture stores (``shutil`` copy); the
versioned store's manifests reference dataset-relative paths, so a
copied tree is a fully valid store at its new root (pinned by
``tests/test_fixture_cache.py``).
"""

from __future__ import annotations

import hashlib
import inspect
import os
import shutil
import tempfile
from collections.abc import Callable
from pathlib import Path

_CODE_HASH: str | None = None
_MODULES_HASH: str | None = None

#: every fixture setup builds its pre-state through these engine
#: modules; their content is part of every cache key.
FIXTURE_BUILD_MODULES = (
    "operators/similarity.py",
    "operators/scoring.py",
    "versioned.py",
    "fsutil.py",
)


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


def _build_modules_hash() -> str:
    """Hash of the engine modules fixtures build through (cached per
    process)."""
    global _MODULES_HASH
    if _MODULES_HASH is None:
        root = Path(__file__).parent
        h = hashlib.sha256()
        for rel in FIXTURE_BUILD_MODULES:
            h.update(rel.encode())
            h.update((root / rel).read_bytes())
        _MODULES_HASH = h.hexdigest()[:16]
    return _MODULES_HASH


def _fixture_key(name: str, setup: Callable[[str], None], sf_dir: str) -> str:
    """Cache key: setup-recipe source + builder-module content (+ name,
    sf). Falls back to the whole-tree hash when the setup's source
    can't be read — never a stale hit, possibly an extra rebuild."""
    try:
        recipe = inspect.getsource(setup)
        code_part = f"{_build_modules_hash()}|{hashlib.sha256(recipe.encode()).hexdigest()[:16]}"
    except (OSError, TypeError):
        code_part = code_tree_hash()
    return hashlib.sha256(f"{name}|{sf_dir}|{code_part}".encode()).hexdigest()[:24]


def fixture_dir(name: str, setup: Callable[[str], None], sf_dir: str = "") -> str:
    """A work directory holding the fixture ``setup`` produces.

    * no ``SPARK_GRAFT_FIXTURE_CACHE`` in the environment (pytest, the
      correctness driver): fresh ``mkdtemp`` + ``setup(work)`` — the
      historical behavior, no cache anywhere;
    * cache enabled (the bench): build once per
      ``(name, sf_dir, setup source, builder-module hash)`` into the
      cache, then hand out a fresh private COPY per call, so per-rep
      mutations never leak between reps and reruns measure the
      operator, not the setup. Same-name slots with a DIFFERENT key
      (older code) are pruned at build time.
    """
    cache_root = os.environ.get("SPARK_GRAFT_FIXTURE_CACHE")
    if not cache_root:
        work = tempfile.mkdtemp(prefix=f"fjs_{name}_")
        setup(work)
        return work
    key = _fixture_key(name, setup, sf_dir)
    slot = os.path.join(cache_root, f"{name}.{key}")
    done = os.path.join(slot, "_FIXTURE_DONE")
    if not os.path.exists(done):
        # single-process protocol (the bench is one process; a crashed
        # partial build leaves no _FIXTURE_DONE and is rebuilt)
        if os.path.exists(slot):
            shutil.rmtree(slot)
        # prune superseded same-name slots so the persistent cache
        # stays bounded at one slot per fixture name
        try:
            for entry in os.listdir(cache_root):
                if entry.startswith(f"{name}.") and entry != f"{name}.{key}":
                    shutil.rmtree(os.path.join(cache_root, entry),
                                  ignore_errors=True)
        except OSError:
            pass
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
