"""Query registry — the declared capability surface of the engine.

Every implemented operator from SURVEY.md §2 (plus the large-scale
extension operators) is exposed here as a named query over the driver
test tables, paired with an ANSI-SQL oracle that DuckDB can run on the
same parquet. The driver (and our pytest suite) compares the two.

Conventions:
* every computed column is aliased identically in Spark and oracle SQL;
* timestamps are emitted as epoch microseconds (BIGINT) — avoids
  tz/precision drift between Spark and DuckDB;
* floating aggregates are rounded (2-6 dp) so summation order can't
  flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


from contextlib import contextmanager  # noqa: E402


# Shuffle-partition count for queries that run a full streaming job.
# Streaming state is partitioned by this number at the FIRST checkpoint
# and every micro-batch pays a per-partition state-store open+commit
# (with RocksDB: instance open, WAL, checkpoint upload) regardless of
# data volume — so unlike batch shuffles (where AQE coalesces), this
# must be sized to STATE volume, not cluster width. 8 partitions carry
# the sf0.1 state comfortably (measured 6× over 32 on the stream-stream
# interval join); a 1000-executor deployment sizes it to keys/partition
# ≈ state-store sweet spot, not to 1000.
STREAM_SHUFFLE_PARTITIONS = "8"


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Temporarily set a runtime SQL conf for the duration of a query
    body. The driver's vanilla session defaults to 200 shuffle
    partitions — a 25× per-batch state-store-overhead tax on the
    stateful streaming ops; queries that run a full streaming job scope
    it down to ``STREAM_SHUFFLE_PARTITIONS``."""
    try:
        old = spark.conf.get(key)
    except Exception:  # noqa: BLE001 — unset conf
        old = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    note: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, note: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, note=note)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules so their @register calls run."""
    global _LOADED
    if _LOADED:
        return
    from fink_joiner_spark.queries_ref import core  # noqa: F401
    from fink_joiner_spark.queries_ref import extensions  # noqa: F401

    _LOADED = True
