"""Skew- and shuffle-management operators (the 100 TB survival kit).

* :func:`salted_join` — explicit key-salting for joins whose build side
  is small enough to replicate per salt but whose probe side has hot
  keys AQE can't split (e.g. a changelog where one entity dominates).
  Semantically identical to a plain equi-join; the salt only spreads a
  hot key across ``n_salts`` reducers.
* :func:`write_bucketed` / co-located joins — pre-shuffled storage so
  repeated joins/aggregations on the bucket key run with NO exchange.
  This is the Spark analog of the reference keeping its six topics
  keyed by primary key (``keyBy(0)``, ``CRMLSJoiner.scala:158``): pay
  the partitioning once at ingest, reuse it every query.

AQE's skew-join splitting handles most cases automatically (enabled in
session.py); these are the explicit tools for when the plan must be
pinned.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: probe rows get a random-but-
    deterministic salt (hash of the full row spread over ``n_salts``),
    build rows are replicated once per salt. The hot key's rows land on
    ``n_salts`` reducers instead of one.

    Build-side cost: ×``n_salts`` rows through the shuffle — use for
    small/medium build sides only (for tiny ones just broadcast).

    Only probe-preserving join types are allowed: with the build side
    replicated per salt, right/full-outer would emit each unmatched
    build row ``n_salts`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports probe-preserving joins only {sorted(allowed)}; "
            f"got {how!r} (build side is replicated per salt)"
        )
    salt = (F.abs(F.xxhash64(*probe.columns)) % n_salts).alias("__salt")
    p = probe.select("*", salt)
    b = build.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    out = p.join(b, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: Sequence[str] = (),
) -> None:
    """Persist a table bucketed (and optionally sorted) by key.

    Joins and aggregations between tables bucketed the same way on the
    same key execute WITHOUT a shuffle exchange — the storage layout IS
    the partitioning. At 100 TB this converts the nightly 11-way join
    from eleven shuffles into zero.
    """
    spark = df.sparkSession
    # overwrite-mode saveAsTable still refuses a leftover warehouse dir
    # whose table is NOT in this session's catalog (LOCATION_ALREADY_
    # EXISTS) — drop both the catalog entry and any orphaned location.
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
