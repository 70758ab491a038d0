"""Local replica of the driver's DuckDB-oracle comparison.

Registers the parquet test tables as DuckDB views, runs the oracle SQL,
and compares against the Spark result: column names (order-insensitive),
row count, and values (rows sorted, floats rounded).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str) -> None:
    con = duckdb_con(sf_dir)
    expected = con.execute(oracle).fetchdf()
    actual = spark_df.toPandas()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a, e = _normalize(actual), _normalize(expected)
    mismatches = [(x, y) for x, y in zip(a, e) if x != y]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
