"""Every registered query with an oracle must hash-match DuckDB —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from fink_joiner_spark.queries import REGISTRY, _ensure_loaded
from tests.helpers import assert_matches_oracle

_ensure_loaded()
_WITH_ORACLE = [n for n, s in REGISTRY.items() if s.oracle is not None]
_ROWS_ONLY = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 1


def test_exact_dedup_multicolumn_framing(spark):
    """Column-boundary and NULL framing: ('ab','c') vs ('a','bc') and
    ('x', NULL) vs ('x', '') are DISTINCT contents and must not merge."""
    from fink_joiner_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc"), (3, "x", None), (4, "x", "")],
        "id long, c1 string, c2 string",
    )
    out = dedup.exact_dedup(df, ["c1", "c2"], "id", normalize=False)
    assert out.count() == 4  # four distinct contents, no collisions
