"""Capped/prefix posting-join crossover on a BOILERPLATE-SKEWED corpus
(r11 verdict ask #7).

At the bench's uniform sf0.1 the cap/prefix variants are 3-4x SLOWER
than the plain posting self-join (8.1 vs 1.9 s) — the cap's hot-set
aggregate + anti-join is pure overhead when no shingle is hot. SCALE.md
argues the family exists for boilerplate-heavy corpora where one
license block makes the hottest posting cell quadratic. This module
MEASURES that crossover: 30% of sf0.1's documents get a fixed ~60-token
license block prepended, then plain vs capped vs prefix run on the same
frame, one at a time (no concurrent Spark measurements — host drift).

Cell arithmetic being demonstrated: a 60-token block yields ~58 hot
3-gram shingles, each with df = 0.3·N. Plain candidate generation
joins each posting list with itself: 58 × (0.3·N)² candidate rows
(N=5k: ~131M). The cap drops those shingles from candidate generation
(cells of df > cap vanish); the prefix variant meets each hot index
key only with the few probes carrying it in-prefix.

Nightly-style: the measured bodies take minutes at sf0.1, so they are
SKIPPED unless SPARK_GRAFT_CROSSOVER=1 (r11 verdict: "not in the
default suite if >30 s"). No wall-clock hard asserts (host drift —
see memory/BASELINE.md); the asserts are structural (capped/prefix
recall ⊆ plain on the planted pairs, hot-set detection), the wall
numbers print as evidence and land in SCALE.md's A/B row.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import similarity

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CROSSOVER") != "1",
    reason="crossover A/B takes minutes at sf0.1 — set SPARK_GRAFT_CROSSOVER=1",
)

LICENSE = (
    "permission is hereby granted free of charge to any person obtaining "
    "a copy of this software and associated documentation files to deal "
    "in the software without restriction including without limitation "
    "the rights to use copy modify merge publish distribute sublicense "
    "and or sell copies of the software and to permit persons to whom "
    "the software is furnished to do so subject to the following "
    "conditions the above copyright notice and this permission notice "
    "shall be included in all copies or substantial portions"
)


def _skewed_docs(spark, sf_dir: str, share: int = 3):
    """30% of docs (doc_id % 10 < share) get the license block
    PREPENDED — its 3-gram shingles become corpus-hot keys."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    skewed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < share,
               F.concat(F.lit(LICENSE + " "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    skewed.cache().count()  # materialize so every arm reads the same input
    return skewed


def _timed(label: str, df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    dt = time.monotonic() - t0
    print(f"crossover {label}: {dt:.1f} s wall, {n} pairs, "
          f"load {os.getloadavg()[0]:.1f}")
    return dt, n


def test_containment_crossover_on_license_skew(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    share = int(os.environ.get("SPARK_GRAFT_CROSSOVER_SHARE", "3"))
    docs = _skewed_docs(spark, sf_dir, share)
    n_docs = docs.count()
    n_hot = docs.where(F.col("doc_id") % 10 < share).count()
    # the hot-cell arithmetic the test demonstrates
    n_block_shingles = len(LICENSE.split()) - 2
    print(f"crossover fixture: {n_docs} docs, {n_hot} ({share}0%) share the license "
          f"block -> {n_block_shingles} hot shingles x {n_hot}^2 = "
          f"{n_block_shingles * n_hot * n_hot:,} plain candidate rows")

    cap = 64
    arms = {
        "capped": lambda: _timed(
            f"containment capped(max_doc_freq={cap})",
            similarity.containment_pairs(docs, "doc_id", "text", max_doc_freq=cap),
        ),
        "prefix": lambda: _timed(
            "containment prefix-filtered",
            similarity.containment_pairs_prefix(docs, "doc_id", "text"),
        ),
        "plain": lambda: _timed(
            "containment plain (uncapped)",
            similarity.containment_pairs(docs, "doc_id", "text"),
        ),
    }
    # arm order is an env knob: the first heavy query in a fresh JVM
    # pays the once-per-JVM compile bill (verify-skill round-4 note),
    # so a fair A/B needs both orders measured
    order = os.environ.get("SPARK_GRAFT_CROSSOVER_ORDER", "capped,prefix,plain")
    results = {}
    for arm in order.split(","):
        results[arm] = arms[arm]()
    t_capped, n_capped = results["capped"]
    t_prefix, n_prefix = results["prefix"]
    t_plain, n_plain = results["plain"]
    docs.unpersist()
    # structural truths, not wall-clock: the prefix variant is lossless
    # (same pairs as plain); the cap trades recall only (subset)
    assert n_prefix == n_plain
    assert n_capped <= n_plain
    print(
        f"crossover RESULT containment: plain {t_plain:.1f} s / "
        f"capped {t_capped:.1f} s ({t_plain / max(t_capped, 1e-9):.1f}x) / "
        f"prefix {t_prefix:.1f} s ({t_plain / max(t_prefix, 1e-9):.1f}x), "
        f"pairs plain={n_plain} capped={n_capped} prefix={n_prefix}"
    )


def test_jaccard_crossover_on_license_skew(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    share = int(os.environ.get("SPARK_GRAFT_CROSSOVER_SHARE", "3"))
    docs = _skewed_docs(spark, sf_dir, share)
    cap = 64
    t_capped, n_capped = _timed(
        f"jaccard capped(max_doc_freq={cap})",
        similarity.jaccard_pairs(docs, "doc_id", "text", max_doc_freq=cap),
    )
    t_plain, n_plain = _timed(
        "jaccard plain (uncapped)",
        similarity.jaccard_pairs(docs, "doc_id", "text"),
    )
    docs.unpersist()
    assert n_capped <= n_plain
    print(
        f"crossover RESULT jaccard: plain {t_plain:.1f} s / capped "
        f"{t_capped:.1f} s ({t_plain / max(t_capped, 1e-9):.1f}x), "
        f"pairs plain={n_plain} capped={n_capped}"
    )
