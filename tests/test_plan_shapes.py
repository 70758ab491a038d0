"""Plan-shape regression gate (r10 verdict ask #6).

The DuckDB oracle proves VALUES; it cannot see a plan regression — a
lost broadcast, an extra shuffle, a scan that stopped pruning columns
— which is exactly the class of bug that stays invisible at sf0.01
and melts a 1000-executor run. This gate snapshots a structural
fingerprint of the static physical plan for the headline/compute
queries into ``tests/plan_fingerprints.json`` and fails on any
DIRECTIONAL regression:

* ``shuffles``, ``cartesian``, ``bnlj``, ``max_scan_cols`` may not
  increase;
* ``broadcast_joins`` may not decrease.

Improvements (fewer shuffles, more broadcasts) pass but print a
reminder to refresh the baseline so the gate keeps teeth.

Refresh after an INTENTIONAL plan change:

    SPARK_GRAFT_UPDATE_PLANS=1 python -m pytest tests/test_plan_shapes.py -q

which rewrites the JSON at the conftest SF (fingerprints are taken at
``tests/conftest.SF_DIR`` — broadcast threshold decisions depend on
input size estimates, so baseline and check must share the SF; the
test skips on a mismatched SF instead of flagging false regressions).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from fink_joiner_spark import plans

_FP_FILE = Path(__file__).parent / "plan_fingerprints.json"

# headline/compute queries with a meaningful single-DataFrame plan:
# the bench top by wall time minus streaming/index-lifecycle demos
# (their "plan" is a job sequence; probe plans are covered by the
# dedicated audits in test_plans.py) plus the flagship joins.
_GATED = [
    "flagship_dedup_left_join",
    "j1_multiway_left_join",
    "j2_inner_join",
    "j3_asof_join_inner",
    "a3_count_over_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_capped",
    "dedup_jaccard_prefix",
    "dedup_containment",
    "dedup_containment_prefix",
    "dedup_containment_capped",
    "dedup_winnowing_pairs",
    "dedup_winnowing_rolling",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_semantic_semdedup",
    "simsearch_topk_bruteforce",
    "simsearch_topk_lsh",
    "simsearch_topk_ivf",
    "simsearch_topk_pq",
    "simsearch_hard_negatives",
    "ext_hybrid_search_rrf",
    "ext_dsir_select",
    "multimodal_features",
    "text_quality",
]

_MUST_NOT_RISE = ["shuffles", "cartesian", "bnlj", "max_scan_cols"]
_MUST_NOT_FALL = ["broadcast_joins"]


def _build(name, spark, sf_dir):
    from fink_joiner_spark import queries as Q

    return Q.queries()[name](spark, sf_dir)


@pytest.fixture(scope="module")
def baseline():
    if not _FP_FILE.exists():
        pytest.skip("no committed plan_fingerprints.json (run the refresh)")
    return json.loads(_FP_FILE.read_text())


def test_refresh_or_presence(spark, sf_dir):
    """With SPARK_GRAFT_UPDATE_PLANS=1, (re)write the baseline; plain
    runs just assert it exists and matches this SF."""
    if os.environ.get("SPARK_GRAFT_UPDATE_PLANS") == "1":
        fps = {}
        for name in _GATED:
            fps[name] = plans.plan_fingerprint(_build(name, spark, sf_dir))
        _FP_FILE.write_text(
            json.dumps({"sf_dir": sf_dir, "queries": fps}, indent=1, sort_keys=True)
            + "\n"
        )
    assert _FP_FILE.exists(), (
        "plan baseline missing: SPARK_GRAFT_UPDATE_PLANS=1 "
        "python -m pytest tests/test_plan_shapes.py"
    )


@pytest.mark.parametrize("name", _GATED)
def test_plan_shape_not_regressed(spark, sf_dir, baseline, name):
    if os.environ.get("SPARK_GRAFT_UPDATE_PLANS") == "1":
        pytest.skip("refresh run")
    if baseline.get("sf_dir") != sf_dir:
        pytest.skip(
            f"baseline taken at {baseline.get('sf_dir')}, running at "
            f"{sf_dir} — size-estimate-driven join picks differ by SF"
        )
    want = baseline["queries"].get(name)
    if want is None:
        pytest.fail(f"{name} gated but absent from baseline — refresh it")
    got = plans.plan_fingerprint(_build(name, spark, sf_dir))
    problems = []
    for k in _MUST_NOT_RISE:
        if got[k] > want[k]:
            problems.append(f"{k} rose {want[k]} -> {got[k]}")
    for k in _MUST_NOT_FALL:
        if got[k] < want[k]:
            problems.append(f"{k} fell {want[k]} -> {got[k]}")
    assert not problems, (
        f"plan shape regressed for {name}: {'; '.join(problems)}\n"
        f"baseline={want}\nnow={got}\n"
        "If intentional, refresh: SPARK_GRAFT_UPDATE_PLANS=1 "
        "python -m pytest tests/test_plan_shapes.py"
    )
    better = [
        k for k in _MUST_NOT_RISE if got[k] < want[k]
    ] + [k for k in _MUST_NOT_FALL if got[k] > want[k]]
    if better:
        print(f"plan IMPROVED for {name} ({better}) — refresh the baseline "
              "to lock in the win")
