"""Latest-version-per-key deduplication — the reference's signature
operator (A1/A2 in SURVEY.md §2.3).

Reference semantics (``CRMLSJoiner.scala:182`` and 5 sibling sites)::

    SELECT * FROM t
    WHERE (pk, ts) IN (SELECT pk, MAX(ts) FROM t GROUP BY pk)

i.e. keep every row carrying the maximum ``ts`` for its key — ties at
the max are ALL kept. Three batch forms are provided (semantically
equal when there are no ties; the window form breaks ties):

* :func:`latest_per_key` — ``max_by``-style via window ``row_number``;
  exactly one row per key (deterministic tie-breakers required).
* :func:`latest_per_key_all_ties` — the reference's exact IN-subquery
  semantics via an aggregate + broadcast-capable semi-join.
* :func:`latest_per_key_sql` — the literal tuple-IN SQL (P5), parsed by
  Catalyst's ``RewritePredicateSubquery`` into the same semi-join.

Scale: both shapes are a single hash shuffle on the key — the same
exchange Flink's keyed group-aggregate performs. The aggregate side is
partial (map-side combine) so the shuffle carries one row per key per
map task, not the raw stream. At 100 TB with a hot key, AQE skew-join
handles the semi-join back; the window form should be preferred only
when keys are high-cardinality and well distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """One latest row per key via ``row_number`` over a desc window.

    ``tie_breakers`` (desc) make the choice deterministic when several
    rows share the max ``order_col``.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tie_breakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_all_ties(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Reference-exact dedup: all rows at the per-key max are kept.

    ``groupBy(keys).agg(max(order_col))`` then a semi-join back on
    ``keys + [order_col]`` — identical result set to the tuple-IN
    subquery, expressed as composable DataFrame ops.
    """
    maxes = df.groupBy(*keys).agg(F.max(order_col).alias(order_col))
    return df.join(maxes, on=[*keys, order_col], how="left_semi")


def latest_per_key_sql(
    df: DataFrame, view: str, keys: Sequence[str], order_col: str
) -> DataFrame:
    """The literal reference SQL shape (tuple-IN subquery, P5)."""
    spark = df.sparkSession
    df.createOrReplaceTempView(view)
    key_list = ", ".join(keys)
    return spark.sql(
        f"SELECT * FROM {view} "
        f"WHERE ({key_list}, {order_col}) IN "
        f"(SELECT {key_list}, MAX({order_col}) FROM {view} GROUP BY {key_list})"
    )


def group_max(df: DataFrame, keys: Sequence[str], order_col: str, alias: str) -> DataFrame:
    """A2: the bare ``SELECT keys, MAX(ts) GROUP BY keys`` aggregate."""
    return df.groupBy(*keys).agg(F.max(order_col).alias(alias))


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Exact-content dedup: keep the smallest ``id_col`` per content hash.

    Hash-groupBy over an md5 of the (optionally normalized) content —
    one shuffle keyed by a 128-bit digest, so 100 TB of documents
    reduces to one row per distinct content on the combine side.
    """
    cols = [F.col(c).cast("string") for c in content_cols]
    if normalize:
        cols = [F.lower(F.trim(c)) for c in cols]
    # \x1f unit separator + \x00 NULL sentinel: multi-column contents
    # can't collide across column boundaries (('ab','c') vs ('a','bc'))
    # and ('x', NULL) hashes differently from ('x', '')
    cols = [F.coalesce(c, F.lit("\x00")) for c in cols]
    fingerprint = F.md5(F.concat_ws("\x1f", *cols))
    return (
        df.withColumn("__fp", fingerprint)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .withColumnRenamed("__fp", "content_hash")
    )
