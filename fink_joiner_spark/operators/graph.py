"""Distributed graph operators for dedup-cluster resolution.

Near-dup detection (MinHash-LSH, SimHash, Jaccard — ``similarity.py``)
emits PAIRS; an actual dedup pipeline must resolve pairs into CLUSTERS
(connected components) and then keep one canonical document per
cluster. The reference stops at join maintenance; this is the
training-data-pipeline extension the corpus-prep family needs.

``connected_components`` implements the alternating Large-Star /
Small-Star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014): each round is two keyed
groupBy+join passes, and the edge set converges to stars centered at
each component's minimum id in O(log n) rounds — unlike naive label
propagation, whose round count is the graph DIAMETER (a 1M-long chain
of near-dup shards would need 1M rounds; large/small-star needs ~20).

Scale notes:
* every round is shuffle-keyed by node id — no broadcast of the edge
  set, no driver-side graph;
* per-round driver work is one ``count()`` (convergence metric), the
  same iterative shape as the k-means codebook trainer;
* lineage is truncated every round with ``localCheckpoint`` so the
  plan does not grow with iteration count (on a cluster you would
  point this at a reliable checkpoint dir instead).
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger(__name__)

# JVM RDD handles for localCheckpoint blocks that back RESULT DataFrames
# of finished CC runs.  They can only be released once the caller has
# fully consumed the result; ``free_checkpoints()`` (called by bench.py
# between queries) drains this.  Intermediate per-round blocks are freed
# eagerly inside the loop and never land here.
_PENDING_FREE: list = []


def _ckpt_handle(df: DataFrame):
    """JVM RDD backing a ``localCheckpoint``'d DataFrame (LogicalRDD plan)."""
    return df._jdf.queryExecution().analyzed().rdd()


def _unpersist_handle(handle) -> None:
    try:
        handle.unpersist(False)
    except Exception:  # noqa: BLE001 — freeing storage is best-effort
        pass


def free_checkpoints() -> None:
    """Release localCheckpoint blocks of finished CC runs.

    Safe once the DataFrames returned by :func:`connected_components` /
    :func:`keep_canonical` have been fully consumed (collected/written);
    the blocks are lineage-truncated, so consuming them afterwards fails.
    """
    while _PENDING_FREE:
        _unpersist_handle(_PENDING_FREE.pop())


def _large_star(e: DataFrame) -> DataFrame:
    """One Large-Star round: for every node u, connect all strictly
    LARGER neighbors to m = min(N(u) ∪ {u}).

    Shape (r14, guide §2.4): the per-group minimum is a WINDOW min
    over partitionBy(u) instead of the historical groupBy(u) aggregate
    joined back onto the edge set — one exchange of the symmetrized
    edges (plus a partition-local sort) replaces two (groupBy input +
    join probe side; the join also stops being a broadcast-build that
    could not exist at 10¹⁰-node scale). The trailing ``distinct`` is
    LOAD-BEARING: dedup components are cliques, Large-Star emits each
    (v, m) once per neighbor, and the distinct collapses that
    quadratic intermediate before Small-Star reprocesses it (removing
    it was measured-rejected r13: CC family 13.9 → 21.8 s)."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    from pyspark.sql import Window

    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One Small-Star round: orient edges toward the smaller endpoint,
    then connect every smaller neighbor (and u itself) to the minimum.

    Same window-min shape as :func:`_large_star`; the leaf edges
    (v → m) and the center edge (u → m) are emitted from ONE pass via
    ``explode(array(struct, struct))`` (the `_directed_rows` pattern)
    instead of a union of the joined frame with the aggregate — the
    center-edge duplicates (one per group row) collapse map-side in
    the trailing distinct's partial aggregate, inside the same
    partition the window already built."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    from pyspark.sql import Window

    withm = oriented.withColumn(
        "m", F.min("v").over(Window.partitionBy("u"))
    )
    pair = F.explode(
        F.array(
            F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
            F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
        )
    )
    return (
        withm.select(pair.alias("r"))
        .select("r.u", "r.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Resolve an undirected pair list into connected components.

    Returns ``(id, component)`` for every node appearing in ``edges``,
    where ``component`` is the smallest node id in the component — a
    deterministic, join-able cluster key.

    Alternates Large-Star and Small-Star until the edge set reaches a
    fixpoint (all stars, every node pointing at its component min).
    Convergence is detected by an order-free fingerprint — (count,
    XOR of xxhash64(u, v)) over the distinct edge set — computed in the
    SAME job that materializes the round's lazy checkpoint, so each
    round costs exactly one Spark job (an exact set-diff check would
    add a second full pass per round for no information the
    fingerprint doesn't already give: rows are distinct, so XOR
    fingerprints the set, and a collision between successive rounds is
    ~2⁻⁶⁴; XOR, unlike SUM, can't overflow under ANSI mode).
    """

    def fingerprint(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    live = _ckpt_handle(e)
    fp = fingerprint(e)
    converged = fp[0] == 0
    rounds = 0
    for _ in range(max_iters if fp[0] else 0):
        e_new = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_handle = _ckpt_handle(e_new)
        fp_new = fingerprint(e_new)  # materializes e_new's checkpoint
        # e_new no longer needs its parent — free the superseded round's
        # blocks NOW (at most two rounds of edges live at any moment,
        # instead of max_iters sets accumulating in the block manager).
        _unpersist_handle(live)
        live = new_handle
        e = e_new
        rounds += 1
        if fp_new == fp:
            converged = True
            break
        fp = fp_new
    if not converged:
        warnings.warn(
            f"connected_components: no fingerprint fixpoint after "
            f"{max_iters} rounds — labels may be over-segmented "
            f"(components under-merged); raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )
    logger.info("connected_components converged in %d rounds", rounds)
    # final star edges point (member -> center); centers label themselves.
    # Materialize the (much smaller: one row per node) label set eagerly
    # so the edge blocks of the final round can be freed immediately.
    labels = (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(e.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
        .localCheckpoint(eager=True)
    )
    _unpersist_handle(live)
    _PENDING_FREE.append(_ckpt_handle(labels))
    return labels


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    length_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-dup clusters to one canonical document each.

    Every doc joins its cluster id (docs without any near-dup pair are
    their own singleton cluster); the canonical member is the LONGEST
    doc (``length_col`` desc), ties broken by smallest id — the
    standard "keep the most complete copy" policy.

    Returns ``(component, doc_id, cluster_size)`` — one row per
    surviving document. Plan: components (keyed shuffles) → one LEFT
    join docs→labels → one groupBy per cluster; the per-cluster argmax
    is a ``max_by`` aggregate, not a window over the full corpus.
    """
    labels = connected_components(pairs, src=src, dst=dst)
    labeled = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(length_col).cast("long").alias("_len"),
        )
        .join(labels, F.col("doc_id") == F.col("id"), "left")
        .select(
            "doc_id",
            "_len",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    return (
        labeled.groupBy("component")
        .agg(
            # max_by with a (len, -id) sort key: longest doc, then smallest id
            F.max_by(
                "doc_id", F.struct(F.col("_len"), (-F.col("doc_id")).alias("nid"))
            ).alias("doc_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select("component", "doc_id", "cluster_size")
    )


def pagerank_step(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    damping: float = 0.85,
) -> DataFrame:
    """One weighted-PageRank iteration from a uniform prior:
    pr₁(v) = (1−d)/n + d · Σ_{u→v} pr₀(u) · w(u,v)/out(u), pr₀ = 1/n.

    The iterative shape of every link-analysis / graph-centrality pass;
    callers loop it (broadcast nothing — ranks stay distributed, keyed
    by node). Nodes with no in-edges keep the teleport term only.

    Output: (node, pr) with pr integerized to micropoints before the
    final emit (cross-engine deterministic; the per-node Σ is exact
    because each contribution is integerized FIRST and summed as
    longs). Plan: node set = src∪dst distinct (keyed agg); out-degree
    agg keyed by src; contributions join keyed by src then re-agg keyed
    by dst; final left join onto the node set. Every stage is a keyed
    shuffle over aggregate-sized data — no broadcast of rank state, so
    the same plan runs when the graph is 10¹⁰ edges.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.select(F.count(F.lit(1)).cast("double").alias("n"))
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # pr0(u) = 1/n; contribution(u→v) integerized to micropoints before
    # the dst-keyed SUM so reduction order can't move the hash.
    contrib = (
        e.join(out, "src")
        .crossJoin(F.broadcast(n))
        .select(
            "dst",
            F.floor(
                (F.col("w") / (F.col("out_w") * F.col("n"))) * 1000000.0 + 0.5
            ).cast("long").alias("micro_in"),
        )
        .groupBy("dst")
        .agg(F.sum("micro_in").alias("micro_sum"))
    )
    return (
        nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "node",
            F.round(
                (1.0 - damping) / F.col("n")
                + damping * (F.coalesce(F.col("micro_sum"), F.lit(0)) / 1000000.0),
                6,
            ).alias("pr"),
        )
    )


def pagerank_bounded(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = 1_000_000,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Bounded-iteration PageRank in EXACT integer micro-units — the
    multi-round companion to :func:`pagerank_step`.

    r₀(v) = ``unit`` for EVERY node (src ∪ dst);
    rₖ₊₁(v) = teleport + (``damping_pct`` · Σ_{u→v} (rₖ(u) div out(u))) div 100
    with teleport = (100−damping_pct)·unit div 100, and an empty
    in-neighbour sum contributing 0 — nodes with no in-edges KEEP the
    bare teleport rank every round (rank state is a LEFT join onto the
    full node set, the same stance as :func:`pagerank_step`; an early
    version dropped such nodes from the frontier, which on a directed
    chain emptied the output entirely). Every quantity is int64 and
    every division is integral on non-negative values, so the result is
    bit-identical in ANY engine and ANY reduction order — an iterative
    graph algorithm that still carries a hard value-hash oracle
    (fixed-k unrolled SQL).

    Scale: rank state stays distributed and keyed by node — nothing is
    broadcast or collected; each round is one src-keyed join plus one
    dst-keyed partial-aggregated shuffle and one node-keyed left join,
    the same per-round shape as ``connected_components``. At the
    registry's bounded k ≤ 5 the linear lineage is fine; for large k
    truncate with localCheckpoint per round exactly as the CC loop
    above does. int64 headroom: 100·unit·max_in_degree per node,
    ~9·10¹⁰ at unit=10⁶ and in-degree 10⁶ — five orders below
    overflow.

    ``checkpoint_every=n`` truncates lineage with a lazy
    localCheckpoint every n rounds (the CC loop's mechanism) so the
    plan stays bounded for large ``iters``; the default None keeps the
    linear plan, which is right for the bounded k ≤ 5 registry use.
    """
    # The distinct edge set feeds the degree count, the node set and
    # every round's gather join. Materialize ONCE via lazy
    # localCheckpoint (RDD-block reuse across all consumers inside the
    # single result job); blocks are released by free_checkpoints()
    # after the result is consumed, the CC contract. Round 11: the
    # per-round loop body used to be TWO joins (r⋈deg for shares, then
    # shares⋈e for the gather) plus a re-derived nodes frame — the
    # degree join is round-invariant, so it is hoisted into a
    # checkpointed adjacency-with-out-degree frame (u, v, d) and each
    # round is ONE keyed join + one partial-agg shuffle + one left
    # join; nodes (union+distinct, previously recomputed by every
    # round's left join) is checkpointed too. r div d moves from
    # per-node to per-edge — the identical int64 value, so the value
    # hash is unchanged. Result-plan shuffle count at the registry's
    # k: 10 → 6 (plans.count_shuffles), with the hoisted adj/nodes
    # paid once in the checkpoint materializations.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    _PENDING_FREE.append(_ckpt_handle(e))
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    adj = e.join(deg, "u").localCheckpoint(eager=False)  # (u, v, d)
    _PENDING_FREE.append(_ckpt_handle(adj))
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    _PENDING_FREE.append(_ckpt_handle(nodes))
    teleport = (100 - damping_pct) * unit // 100
    r = nodes.select("node", F.lit(unit).cast("long").alias("r"))
    # r's lineage re-enters adj every round — qualified aliases keep
    # the self-joins unambiguous without disabling the analyzer check.
    for it in range(iters):
        gathered = (
            r.alias("rr")
            .join(adj.alias("ad"), F.col("rr.node") == F.col("ad.u"))
            .groupBy(F.col("ad.v"))
            .agg(F.sum(F.expr("rr.r div ad.d")).alias("s"))
        )
        r = (
            nodes.alias("nd")
            .join(gathered.alias("gt"), F.col("nd.node") == F.col("gt.v"), "left")
            .select(
                F.col("nd.node").alias("node"),
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct} * coalesce(gt.s, 0L)) div 100")
                )
                .cast("long")
                .alias("r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            r = r.localCheckpoint(eager=False)
            # no per-round action runs here (unlike the CC loop's
            # fingerprint), so these blocks can't be freed eagerly —
            # they drain through free_checkpoints() with the result
            _PENDING_FREE.append(_ckpt_handle(r))
    return r.select("node", F.col("r").alias("rank_micro"))
