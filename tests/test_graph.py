"""Connected components (large-star/small-star) + canonical-doc
selection: correctness vs a union-find reference, convergence on
pathological shapes (long chains — the case naive label propagation
can't handle in O(log n) rounds), and determinism under repartition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fink_joiner_spark.operators import graph


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per node
    return {x: find(x) for x in parent}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = graph.connected_components(df).collect()
    return {r["id"]: r["component"] for r in out}


def test_chain_converges_to_min(spark):
    # a 40-node chain: diameter 39, but star-contraction needs few rounds
    edges = [(i, i + 1) for i in range(40)]
    got = _cc_dict(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_two_components_and_duplicate_reversed_edges(spark):
    edges = [(5, 3), (3, 9), (9, 5), (20, 21), (21, 20), (7, 7)]
    got = _cc_dict(spark, edges)
    # self-loop (7,7) contributes no node; components labeled by min
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expect = _union_find(edges)
    got = _cc_dict(spark, edges)
    assert got == expect


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert graph.connected_components(df).count() == 0


def test_keep_canonical_longest_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
        "doc_id long, n_chars long",
    )
    # cluster {1,2,3}: 2 and 3 tie on length 30 -> keep 2; {4} singleton
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {
        r["component"]: (r["doc_id"], r["cluster_size"])
        for r in graph.keep_canonical(docs, pairs, "doc_id", "n_chars").collect()
    }
    assert out == {1: (2, 3), 4: (4, 1), 9: (9, 1)}


def test_components_stable_under_repartition(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    base = sorted(map(tuple, graph.connected_components(df).collect()))
    shuffled = sorted(
        map(tuple, graph.connected_components(df.repartition(13)).collect())
    )
    assert base == shuffled


def test_pagerank_bounded_uniform_cycle(spark):
    """On a directed cycle every node has in=out=1, so rank stays at
    the fixed point: unit micro-units for every node, every round."""
    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src int, dst int"
    )
    out = {r.node: r.rank_micro for r in graph.pagerank_bounded(edges, iters=3).collect()}
    assert out == {i: 1_000_000 for i in range(5)}


def test_pagerank_bounded_star_center_dominates(spark):
    """Symmetrized star: the hub gathers every leaf's full share and
    must outrank all leaves; leaves are symmetric so their ranks are
    identical. Exact integer arithmetic -> exact equality holds."""
    fwd = [(0, i) for i in range(1, 9)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src int, dst int"
    )
    out = {r.node: r.rank_micro for r in graph.pagerank_bounded(edges, iters=3).collect()}
    leaf_ranks = {out[i] for i in range(1, 9)}
    assert len(leaf_ranks) == 1
    assert out[0] > out[1]
    # hub emits 8 shares of r/8, leaves return them whole: mass conserved
    # up to the div truncation, which only ever loses micro-units
    assert sum(out.values()) <= 9 * 1_000_000


def test_pagerank_bounded_matches_python_reference(spark):
    """Bit-exact against a driver-side integer replica on a small
    random graph — pins the div/teleport arithmetic the SQL oracle
    also encodes."""
    import random

    rnd = random.Random(7)
    fwd = list({(rnd.randrange(12), rnd.randrange(12)) for _ in range(30)})
    edges = spark.createDataFrame(
        [e for e in fwd if e[0] != e[1]], "src int, dst int"
    )
    rows = [(r.src, r.dst) for r in edges.distinct().collect()]
    out_deg = {}
    for s, _ in rows:
        out_deg[s] = out_deg.get(s, 0) + 1
    all_nodes = {s for s, _ in rows} | {d for _, d in rows}
    r = {n: 1_000_000 for n in all_nodes}
    for _ in range(3):
        acc = {}
        for s, d in rows:
            acc[d] = acc.get(d, 0) + r[s] // out_deg[s]
        r = {n: 150_000 + (85 * acc.get(n, 0)) // 100 for n in all_nodes}
    got = {x.node: x.rank_micro for x in graph.pagerank_bounded(edges, iters=3).collect()}
    assert got == r


def test_pagerank_bounded_directed_chain_keeps_all_nodes(spark):
    """Directed chain A->B->C: A has no in-edges and must KEEP the
    bare teleport rank every round instead of leaving the output (the
    frontier-drop bug emptied the result entirely at iters=3)."""
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
    out = {r.node: r.rank_micro for r in graph.pagerank_bounded(edges, iters=3).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0] == 150_000
    # B gets only A's teleport share after round 2: 150000 + 85% of 150000
    assert out[1] == 150_000 + (85 * 150_000) // 100
    assert out[0] < out[1] < out[2]


def test_pagerank_bounded_checkpoint_identical(spark):
    """Lineage truncation is a physical choice: ranks must be
    bit-identical with and without per-round checkpointing."""
    import random

    rnd = random.Random(3)
    edges = spark.createDataFrame(
        [e for e in {(rnd.randrange(10), rnd.randrange(10)) for _ in range(25)} if e[0] != e[1]],
        "src int, dst int",
    )
    plain = {(r.node, r.rank_micro) for r in graph.pagerank_bounded(edges, iters=4).collect()}
    ckpt = {
        (r.node, r.rank_micro)
        for r in graph.pagerank_bounded(edges, iters=4, checkpoint_every=1).collect()
    }
    assert plain == ckpt
