"""Temporal (as-of) join — J3, the reference's hardest live operator.

Reference semantics (``FlinkJoiner.scala:231-257``): a temporal table
function over the versioned side (key = ``agent_id``, version time =
``rowtime``); each probe row joins the version with the greatest
version-ts **<= probe-ts** for its key.

Spark has no native as-of join, so two batch strategies:

* :func:`asof_join` — **union-tag + last ignoreNulls window** (the
  scalable default). Union probe and build rows into one stream tagged
  by side, sort within key by (ts, build-first), and carry the latest
  build values forward with ``last(..., ignoreNulls=True)`` over an
  unbounded-preceding row frame. Cost: ONE hash shuffle on the key +
  a within-partition sort — no row-pair explosion, skew-safe with AQE.
  This is the 100 TB plan: per-key state is a running scalar, the same
  memory contract as Flink's temporal-function state.
* :func:`asof_join_rangejoin` — non-equi join + rank-1 filter; can
  explode within hot keys, kept for tiny builds and cross-checks.

Tie semantics: a build version at exactly probe-ts IS visible (``<=``),
matching Flink's temporal table function and DuckDB ``ASOF JOIN``. If
several build rows share (key, ts), the *last one in build order* wins
under the window form — pre-dedup the build side (A1) for determinism,
exactly as the reference joins deduped ``*_tbl_ts`` views.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    build_cols: Sequence[str],
    how: str = "inner",
    tolerance: float | None = None,
) -> DataFrame:
    """Union-tag as-of join. Output: all probe columns + ``build_cols``.

    ``tolerance``: optional max staleness (probe_ts − version_ts) in the
    ts column's native numeric unit (seconds for timestamps — casts to
    double — or the raw unit for numeric ts). Older versions are treated
    as absent, the analog of Flink state TTL.
    """
    probe_cols = probe.columns
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # build sorts before probe at equal ts → visible at ==
        *[F.col(c).alias(f"__b_{c}") for c in build_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}") for c in probe_cols],
    )
    p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in build_cols],
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )
    unioned = b.unionByName(p)

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__b_{c}"), ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in build_cols
        ],
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__v_ts"),
    )
    out = carried.filter(F.col("__side") == 1)

    matched = F.col("__v_ts").isNotNull()
    if tolerance is not None:
        fresh = (
            F.col("__ts").cast("double") - F.col("__v_ts").cast("double")
        ) <= F.lit(float(tolerance))
        matched = matched & fresh

    if how == "inner":
        out = out.filter(matched)
        return out.select(
            *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
            *[F.col(f"__v_{c}").alias(c) for c in build_cols],
        )
    # left: keep probe rows, null out stale/absent versions
    return out.select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
        *[F.when(matched, F.col(f"__v_{c}")).alias(c) for c in build_cols],
    )


def asof_join_rangejoin(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    build_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Cross-check implementation via non-equi join + rank-1 filter.

    Exact but can pair every probe row with every earlier version of its
    key — O(versions) per probe row. Use for small builds or tests.
    """
    p = probe.withColumn("__pid", F.monotonically_increasing_id()).alias("p")
    b = build.alias("b")
    cond = (F.col(f"p.{on}") == F.col(f"b.{on}")) & (
        F.col(f"b.{build_ts}") <= F.col(f"p.{probe_ts}")
    )
    joined = p.join(b, cond, "left")
    w = Window.partitionBy("p.__pid").orderBy(F.col(f"b.{build_ts}").desc_nulls_last())
    ranked = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    out = ranked.select(
        *[F.col(f"p.{c}").alias(c) for c in probe.columns if c != "__pid"],
        *[F.col(f"b.{c}").alias(c) for c in build_cols],
    )
    if how == "inner":
        out = out.filter(F.col(build_cols[0]).isNotNull())
    return out


def asof_join_nearest(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    build_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Bidirectional as-of join (pandas ``merge_asof
    direction='nearest'`` analog): each probe row joins the build
    version with the SMALLEST absolute time distance, ties broken
    toward the backward (earlier-or-equal) version.

    Same union-tag plan as :func:`asof_join` — one hash shuffle on the
    key, two window passes over the same (key, ts) sort (backward
    carry via ``last ignoreNulls`` over unbounded-preceding, forward
    carry via ``first ignoreNulls`` over unbounded-following), so the
    exchange is shared and per-key state stays scalar. No row-pair
    explosion at any key skew.
    """
    probe_cols = probe.columns
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__b_{c}") for c in build_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}") for c in probe_cols],
    )
    p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in build_cols],
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )
    unioned = b.unionByName(p)

    base = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__side").asc())
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    bval = F.when(F.col("__side") == 0, F.col("__ts"))
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__b_{c}"), ignorenulls=True).over(wb).alias(f"__bk_{c}")
            for c in build_cols
        ],
        F.last(bval, ignorenulls=True).over(wb).alias("__bk_ts"),
        *[
            F.first(F.col(f"__b_{c}"), ignorenulls=True).over(wf).alias(f"__fw_{c}")
            for c in build_cols
        ],
        F.first(bval, ignorenulls=True).over(wf).alias("__fw_ts"),
    )
    out = carried.filter(F.col("__side") == 1)

    d_back = F.col("__ts").cast("double") - F.col("__bk_ts").cast("double")
    d_fwd = F.col("__fw_ts").cast("double") - F.col("__ts").cast("double")
    # backward wins when present and not strictly farther than forward
    use_back = F.col("__bk_ts").isNotNull() & (
        F.col("__fw_ts").isNull() | (d_back <= d_fwd)
    )
    matched = F.col("__bk_ts").isNotNull() | F.col("__fw_ts").isNotNull()

    picked = out.select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
        *[
            F.when(use_back, F.col(f"__bk_{c}")).otherwise(F.col(f"__fw_{c}")).alias(c)
            for c in build_cols
        ],
        matched.alias("__matched"),
    )
    if how == "inner":
        return picked.filter(F.col("__matched")).drop("__matched")
    return picked.select(
        *probe_cols,
        *[F.when(F.col("__matched"), F.col(c)).alias(c) for c in build_cols],
    )


def asof_join_cogrouped(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    build_cols: Sequence[str],
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` — the Arrow-batched
    imperative alternative to the declarative union-tag/window plan
    (:func:`asof_join`), completing the Pandas API family alongside
    ``mapInPandas`` and ``applyInPandasWithState``.

    Both sides cogroup on the key; each group pair runs
    ``pandas.merge_asof`` (direction='backward', the b.ts <= p.ts
    semantics; ties pick the last build row in (ts, cols) order — same
    winner as the window form's ordered frame). INNER semantics: probes
    with no prior build row are dropped.

    Scale: one hash shuffle per side keyed by ``on`` (identical to the
    window plan's shuffle), then per-key Arrow batches — the trade is
    Python worker transfer vs JVM window state; prefer the declarative
    form unless per-key logic outgrows SQL expressions.
    """
    import pandas as pd

    p = probe.select(on, probe_ts, *[c for c in probe.columns if c not in (on, probe_ts)])
    # Alias the build-side timestamp to a fresh attribute: when probe
    # and build derive from the SAME relation (self-as-of), both 'ts'
    # columns share one attribute id and the cogroup child pruning
    # silently drops the build side's copy (observed: the worker pdf
    # arrives without it). A new name = a new attribute id.
    b = build.select(on, F.col(build_ts).alias("__bts"), *build_cols)
    build_ts = "__bts"
    # Explicit keyed repartition: per-group Python overhead (Arrow
    # flush + one function call per cogroup key) is SERIAL within a
    # partition, and AQE coalesces a few-MB shuffle down to ONE
    # partition — 150 key-groups became 150 sequential Python calls
    # (measured 10 s vs ~1 s at 32-way). A user-specified repartition
    # is exempt from AQE coalescing, so worker-process parallelism —
    # the scarce resource on the pandas path — survives execution.
    n_parts = probe.sparkSession.sparkContext.defaultParallelism
    p = p.repartition(n_parts, on)
    b = b.repartition(n_parts, on)
    out_fields = [f for f in p.schema.fields] + [
        b.schema[c] for c in build_cols
    ]
    from pyspark.sql.types import StructType

    schema = StructType(out_fields)
    b_sort_cols = [build_ts, *build_cols]
    out_names = [f.name for f in out_fields]
    # plain-data capture only — a DataFrame (or its schema accessor) in
    # the closure would drag the SparkContext into the pickled UDF
    int_cols = [
        c for c in build_cols
        if str(b.schema[c].dataType) in ("LongType()", "IntegerType()")
    ]

    def join_group(pdf_p: pd.DataFrame, pdf_b: pd.DataFrame) -> pd.DataFrame:
        if pdf_p.empty or pdf_b.empty:  # inner: no build rows -> no output
            return pd.DataFrame(columns=out_names)
        left = pdf_p.sort_values(probe_ts, kind="mergesort")
        right = pdf_b.sort_values(b_sort_cols, kind="mergesort")[b_sort_cols]
        m = pd.merge_asof(
            left, right, left_on=probe_ts, right_on="__bts", direction="backward"
        )
        # unmatched marker is the merge key itself (never NULL on a
        # matched row) — filtering on a payload column would also drop
        # matches whose payload is legitimately NULL
        m = m.dropna(subset=["__bts"])
        # unmatched rows turned ints into float64 — restore exact dtypes
        for c in int_cols:
            if pd.api.types.is_float_dtype(m[c]):
                m[c] = m[c].astype("int64")
        return m[out_names]

    return (
        p.groupBy(on)
        .cogroup(b.groupBy(on))
        .applyInPandas(lambda pl, pr: join_group(pl, pr), schema)
    )
