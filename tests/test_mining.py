"""Frequent-pair mining: a-priori pruning semantics and exactness."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from fink_joiner_spark.operators import mining


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket int, item string")


def test_frequent_pairs_exact_counts(spark):
    rows = []
    # items a,b co-occur in baskets 1..3; c tags along once
    for bk in (1, 2, 3):
        rows += [(bk, "a"), (bk, "b")]
    rows += [(1, "c"), (4, "a"), (4, "c"), (5, "a"), (5, "b")]
    out = mining.frequent_pairs(
        _baskets(spark, rows), "basket", "item",
        min_item_support=2, min_pair_support=2,
    ).collect()
    got = {(r.item_a, r.item_b): r.support for r in out}
    # (a,b) in baskets 1,2,3,5; (a,c) in baskets 1,4; (b,c) only in
    # basket 1 -> below min_pair_support
    assert got == {("a", "b"): 4, ("a", "c"): 2}


def test_frequent_pairs_duplicate_lines_count_once(spark):
    # the same item repeated inside one basket must not inflate support
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    out = mining.frequent_pairs(
        _baskets(spark, rows), "basket", "item",
        min_item_support=1, min_pair_support=1,
    ).collect()
    got = {(r.item_a, r.item_b): r.support for r in out}
    assert got == {("x", "y"): 2}


def test_frequent_pairs_matches_bruteforce(spark):
    import random

    rnd = random.Random(11)
    rows = [(b, f"i{rnd.randrange(8)}") for b in range(30) for _ in range(4)]
    out = mining.frequent_pairs(
        _baskets(spark, rows), "basket", "item",
        min_item_support=3, min_pair_support=2,
    ).collect()
    got = {(r.item_a, r.item_b): r.support for r in out}

    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    item_sup = {}
    for s in baskets.values():
        for i in s:
            item_sup[i] = item_sup.get(i, 0) + 1
    freq = {i for i, n in item_sup.items() if n >= 3}
    want = {}
    for s in baskets.values():
        for a, b in combinations(sorted(s & freq), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    want = {k: v for k, v in want.items() if v >= 2}
    assert got == want


def test_frequent_pairs_default_item_filter_is_lossless(spark):
    """With the default (min_item_support=None -> min_pair_support),
    the a-priori item filter is pure pruning: rare items that always
    co-occur still surface."""
    rows = [(1, "p"), (1, "q"), (2, "p"), (2, "q")]  # both items support 2
    out = mining.frequent_pairs(
        _baskets(spark, rows), "basket", "item", min_pair_support=2
    ).collect()
    assert {(r.item_a, r.item_b, r.support) for r in out} == {("p", "q", 2)}
