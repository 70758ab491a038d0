"""Deterministic sampling / split operators for training-data pipelines.

The reference has no sampling surface; these are the standard
large-corpus operations layered on the same engine: reproducible
train/val/test assignment and per-stratum downsampling, both as pure
column expressions (no UDF, no shuffle — evaluated inside the scan's
codegen stage, so they cost ~nothing at 100 TB and never materialize a
random state).

Determinism contract: the bucket is a function of the row's stable id
(+ salt), never of partitioning, task order, or a seeded RNG — the same
row lands in the same split on any cluster size, which is what makes
the split reproducible across reruns and engines (the DuckDB oracles
compute the identical md5-prefix bucket).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: buckets granularity for split assignment (percent-style weights)
N_BUCKETS = 100


def hash_bucket(col: Column | str, n_buckets: int = N_BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets) from a stable id.

    Uses the first 8 hex digits of md5 (cross-engine reproducible —
    DuckDB: ``CAST(CONCAT('0x', substr(md5(x),1,8)) AS UBIGINT)``),
    not ``xxhash64`` (Spark-specific seed/variant).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % n_buckets).alias("bucket")


def with_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column: deterministic train/val/test assignment.

    ``weights`` maps split name -> integer percent, summing to 100;
    default 80/10/10. Assignment is by contiguous bucket ranges so the
    oracle is a plain CASE expression.
    """
    weights = dict(weights or {"train": 80, "val": 10, "test": 10})
    if sum(weights.values()) != N_BUCKETS:
        raise ValueError(f"weights must sum to {N_BUCKETS}: {weights}")
    b = hash_bucket(id_col, salt=salt)
    expr = F.lit(None).cast("string")
    hi = N_BUCKETS
    for name, w in reversed(list(weights.items())):
        lo = hi - w
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
        hi = lo
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its hash bucket
    falls below the stratum's fraction (in percent granularity).

    Unlike ``df.sampleBy`` (seeded Bernoulli per partition — different
    rows on re-shuffle), this is stable under any repartitioning.
    """
    b = hash_bucket(id_col, salt=salt)
    thresh = F.lit(int(default_fraction * N_BUCKETS))
    for k, frac in fractions.items():
        thresh = F.when(F.col(strata_col) == k, F.lit(int(frac * N_BUCKETS))).otherwise(
            thresh
        )
    return df.filter(b < thresh)


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, cap: int
) -> DataFrame:
    """Frequency-cap sampling: keep at most ``cap`` rows per group
    (domain/source caps — the "no single domain dominates the corpus"
    policy). Which rows survive is deterministic: rank by
    ``md5(id)`` (an order-free pseudo-random permutation, identical
    across engines and repartitionings), ties by id.

    Plan: one hash shuffle on ``group_col`` + per-partition rank. Spark
    plans ``row_number <= cap`` as a running WindowExec, which
    early-materializes only; for a pathological mega-group the salting
    pattern in ``skew.py`` applies (two-level cap: salt-group cap then
    re-cap). Caps are usually small, so output ≈ groups × cap.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def assign_packs(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Sequence-packing assignment: lay docs end-to-end in a
    deterministic order inside each partition (shard) and assign each
    doc the pack (fixed ``budget``-token context window) its LAST token
    lands in — the bookkeeping step before concatenate-and-split
    training batch construction.

    Emits the input plus ``cum_tokens`` (running total inclusive) and
    ``pack_id`` (0-based). Exact-integer window arithmetic only.
    Partitioned by ``part_col`` so the cumulative sum is a per-shard
    window, not a global single-task sort — shards are the unit a real
    packing job parallelizes over.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    # greatest(..., 0): a zero-token doc at the head of a shard has
    # cum_tokens = 0 and would otherwise land in pack -1.
    return df.withColumn("cum_tokens", cum).withColumn(
        "pack_id", F.floor(F.greatest(F.col("cum_tokens") - 1, F.lit(0)) / budget)
    )


def split_oracle_case(id_expr: str, weights: Sequence[tuple[str, int]], salt: str = "") -> str:
    """DuckDB CASE expression mirroring :func:`with_split` bit-for-bit."""
    bucket = (
        f"(CAST(CONCAT('0x', substr(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), 1, 8)) "
        f"AS UBIGINT) % {N_BUCKETS})"
    )
    clauses, lo = [], 0
    for name, w in weights:
        clauses.append(f"WHEN {bucket} >= {lo} AND {bucket} < {lo + w} THEN '{name}'")
        lo += w
    return "CASE " + " ".join(clauses) + " END"


def shuffle_positions(df: DataFrame, id_col: str, salt: str = "") -> DataFrame:
    """Deterministic global training-order shuffle: assign every row a
    dense position ``pos`` in ``[0, N)`` following the md5 permutation
    of its id — the "shuffle the corpus once, reproducibly" step before
    sharding into training files.

    Scale design: a naive ``row_number() OVER (ORDER BY key)`` collapses
    to ONE task. Instead this is the two-phase distributed zip-with-index
    over sorted data: the first md5 byte splits the keyspace into 256
    ordered ranges (prefix ordering == full-key ordering), a per-range
    ``row_number`` ranks locally after a hash shuffle on the range id,
    and the driver prefix-sums only the 256 range COUNTS into offsets
    (broadcast back). Nothing data-sized touches the driver; at 100 TB
    widen the prefix to 2 bytes (65 536 ranges) for finer balance.

    The DuckDB oracle is the single-window form — identical output.
    """
    id_c = F.col(id_col)
    key = F.md5(F.concat(id_c.cast("string"), F.lit(salt)))
    withkey = df.withColumn("_key", key).withColumn(
        "_rng", F.conv(F.substring("_key", 1, 2), 16, 10).cast("int")
    )
    return ordered_positions(withkey, "_rng", ["_key", id_col]).drop("_key", "_rng")


def ordered_positions(df: DataFrame, range_col: str, order_cols: Sequence[str]) -> DataFrame:
    """Dense 0-based global rank (``pos``) over the total order
    ``(range_col, *order_cols)`` — the scalable replacement for a
    single-task ``row_number() OVER (ORDER BY …)`` window.

    Contract: ``range_col`` is a bounded-cardinality integer range id
    that is consistent with the leading sort key (rows in a lower range
    sort before every row of a higher range). Phase 1 counts rows per
    range (aggregate-sized), the driver prefix-sums ONLY those counts
    into offsets; phase 2 ranks locally inside each range after a hash
    shuffle on the range id and adds the broadcast offset. Nothing
    data-sized touches the driver at any scale."""
    from pyspark.sql import Window

    spark = df.sparkSession
    counts = {
        r["_r"]: r["cnt"]
        for r in df.groupBy(F.col(range_col).alias("_r"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    acc, offsets = 0, []
    for rng in sorted(counts):
        offsets.append((rng, acc))
        acc += counts[rng]
    off_df = spark.createDataFrame(offsets, f"{range_col} int, _off long")

    w = Window.partitionBy(range_col).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.join(F.broadcast(off_df), range_col)
        .withColumn("pos", F.col("_off") + F.row_number().over(w) - 1)
        .drop("_off")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    keep_frac: float = 0.6,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture resampling across groups (languages /
    sources): target counts follow the alpha-smoothed distribution
    ``q_g ∝ n_g^alpha`` (the multilingual rebalancing scheme of
    XLM-R / mT5 — low-resource groups are up-weighted relative to their
    corpus share), scaled to keep ``keep_frac`` of the corpus overall
    and capped at each group's actual size. WHICH rows survive is the
    deterministic md5-rank order (see :func:`cap_per_group`).

    Only alpha=0.5 is cross-engine exact (``sqrt`` is IEEE
    correctly-rounded everywhere; ``pow`` is not) — other alphas work
    but the oracle must tolerate last-ulp drift.

    Plan: one aggregate-sized groupBy for counts, a 1-row total, the
    target table broadcast back, one hash shuffle on ``group_col`` for
    the per-group rank. Nothing data-sized leaves the executors.
    """
    if alpha != 0.5:
        raise ValueError("only alpha=0.5 (sqrt) is cross-engine deterministic")
    from pyspark.sql import Window

    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = cnt.agg(
        F.sum("_n").cast("double").alias("_tot"),
        F.sum(F.sqrt(F.col("_n").cast("double"))).alias("_s"),
    )
    targets = (
        cnt.crossJoin(F.broadcast(tot))
        # association order mirrored verbatim in the oracle SQL
        .withColumn(
            "_t",
            F.least(
                F.floor(
                    F.lit(keep_frac) * F.col("_tot") * F.sqrt(F.col("_n").cast("double"))
                    / F.col("_s")
                    + F.lit(0.5)
                ).cast("long"),
                F.col("_n"),
            ),
        )
        .select(group_col, "_t")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.col(id_col)
    )
    return (
        df.join(F.broadcast(targets), group_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_t"))
        .drop("_rn", "_t")
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-unigram bag is under a
    TARGET-domain language model than under the raw-corpus one —
    log p_target(doc) − log p_raw(doc) — so selecting the top scores
    resamples the raw corpus toward the target distribution. The
    standard "make the crawl look like the curated set" selection
    pass, sitting between quality filtering and mixture sampling.

    Both unigram LMs are add-one-smoothed over HASHED token buckets
    (the paper's hashed n-gram features): bucket =
    ``char_poly_hash(token) % n_buckets`` — the engine's cross-engine
    hash, so a DuckDB oracle reproduces every weight bit-for-bit. The
    per-bucket log-ratio is integerized ONCE per bucket to micro-nats
    (``floor(x·1e6 + 0.5)``, identical IEEE ops in both engines) and
    each document SUMS exact int64 weights over its token occurrences
    — reduction-order independent, the registry's exact-unit rule.

    Scale shape: one tokenize+explode pass over the corpus; the two
    LMs are ONE map-side-combined count aggregate over ≤ ``n_buckets``
    groups (the target counts are a conditional sum in the same pass),
    collected ONCE (≤ ``n_buckets`` rows) — totals and the broadcast
    weight table both derive from that single collect, so the corpus
    scan is never re-evaluated; the per-doc score joins each token row
    to the broadcast ``n_buckets``-row weight table and partially
    aggregates by doc — no all-corpus shuffle beyond the doc-keyed
    sum, no Python in the hot path.

    Returns (``id_col``, imp_micro) — one row per document with ≥1
    token; callers rank/threshold (see the registered
    ``ext_dsir_select`` for the top-N form).
    """
    from fink_joiner_spark.operators.text import char_poly_hash, tokens

    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("t"),
        is_target.cast("boolean").alias("is_t"),
    )
    tok = d.select(
        "doc_id", "is_t", F.explode(tokens(F.col("t"))).alias("w")
    ).withColumn("b", char_poly_hash(F.col("w")) % n_buckets)
    # materialize the ≤ n_buckets count rows ONCE — totals and the
    # weight table both derive from this collect, so the
    # tokenize+explode pass over the corpus runs exactly once (an
    # uncached `counts` DataFrame would be re-evaluated by the join
    # below after totals.first() already paid the full scan)
    count_rows = (
        tok.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("ct"),
        )
        .collect()
    )
    spark = df.sparkSession
    counts = spark.createDataFrame(
        [(int(r["b"]), int(r["cr"]), int(r["ct"])) for r in count_rows]
        or [(0, 0, 0)],
        "b long, cr long, ct long",
    )
    nr = sum(int(r["cr"]) for r in count_rows)
    nt = sum(int(r["ct"]) for r in count_rows)
    # add-one smoothing over the bucket vocabulary; the log-ratio is
    # built from the SAME expression shape the oracle uses:
    # ln((ct+1)/(nt+B)) − ln((cr+1)/(nr+B)), doubles end to end
    w_micro = F.floor(
        (
            F.log((F.col("ct") + F.lit(1.0)) / F.lit(float(nt + n_buckets)))
            - F.log((F.col("cr") + F.lit(1.0)) / F.lit(float(nr + n_buckets)))
        )
        * 1_000_000.0
        + 0.5
    ).cast("long")
    weights = counts.select("b", w_micro.alias("w_micro"))
    return (
        tok.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.sum("w_micro").alias("imp_micro"))
        .select(F.col("doc_id").alias(id_col), "imp_micro")
    )
