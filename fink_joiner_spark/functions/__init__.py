"""User-defined function surface (SURVEY.md §2.6).

The reference's only UDF-like object is a system-generated temporal
table function (U1 → implemented as the as-of join operator,
``operators/asof.py``). The new engine exposes the full Spark UDF
family for users extending it:

* scalar Pandas UDFs (Arrow-vectorized),
* grouped-agg Pandas UDFs,
* Python UDTFs (``@udtf``, Spark 3.5+) — the generic lateral-join
  surface U1 belongs to.

Shipped instances are small but real: a shingle-explode UDTF (the
lateral-view analog of the reference's ``LATERAL TABLE(...)`` call
shape, ``FlinkJoiner.scala:246``) and a vectorized cosine scalar UDF.
UDF objects are built lazily — Spark requires an active session at
decoration time.
"""

from __future__ import annotations

import pandas as pd


class _ShingleExplode:
    """UDTF body: emit (shingle, position) rows for 3-word shingles."""

    def eval(self, text: str):
        toks = [t for t in (text or "").lower().split() if t]
        for i in range(max(0, len(toks) - 2)):
            yield (" ".join(toks[i : i + 3]), i)


def shingle_udtf():
    from pyspark.sql.functions import udtf

    return udtf(_ShingleExplode, returnType="shingle: string, pos: int")


def cosine_pandas_udf():
    """Arrow-vectorized cosine similarity between two array columns —
    the Pandas-UDF fallback for semantics awkward in SQL lambda algebra;
    ~10-100× faster than row-at-a-time Python UDFs."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        dot = (av * bv).sum(axis=1)
        na = np.sqrt((av * av).sum(axis=1))
        nb = np.sqrt((bv * bv).sum(axis=1))
        return pd.Series(dot / (na * nb))

    return cosine_udf


def register_all(spark) -> None:
    """Register the engine's SQL-visible functions on a session."""
    spark.udtf.register("shingles", shingle_udtf())
    spark.udf.register("cosine_sim", cosine_pandas_udf())


def weighted_mean_agg_udf():
    """Grouped-agg Pandas UDF (the third UDF family): exact weighted
    mean over (value, weight) pairs — aggregates Spark's built-in SQL
    can express only clumsily. Arrow moves each group's columns as one
    batch; the group is the parallel unit, so this scales like any
    keyed aggregate (one shuffle, no per-row Python)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        wsum = w.sum()
        if wsum == 0:
            return float("nan")
        return float(np.dot(v.to_numpy(), w.to_numpy()) / wsum)

    return weighted_mean
