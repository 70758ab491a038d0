"""Edge-case tests for batch sessionization and vocab numericalization
(the oracle suite covers the registered-query happy path)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from fink_joiner_spark.operators import sessions, text


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(
        minutes=minute, seconds=second
    )


def test_sessionize_gap_boundary(spark):
    """A gap of EXACTLY the threshold stays in the same session; one
    microsecond past it starts a new one (strict >)."""
    rows = [
        (1, _ts(0), 1),
        (1, _ts(30), 2),   # exactly 30 min after -> same session
        (1, _ts(60, 1), 3),  # 30 min 1 s after previous -> new session
        (2, _ts(0), 4),    # other key: independent numbering
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessions.sessionize(df, ["user_id"], "ts", gap="30 minutes", tie_breakers=["event_id"])
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_tie_breaker_determinism(spark):
    """Equal timestamps order by the tie-breaker, so session stats are
    stable however the rows arrive."""
    base = [(1, _ts(0), i) for i in (5, 3, 9)] + [(1, _ts(45), 7)]
    df1 = spark.createDataFrame(base, "user_id long, ts timestamp, event_id long")
    df2 = spark.createDataFrame(list(reversed(base)), "user_id long, ts timestamp, event_id long")
    cols = ["user_id", "session_idx", "n_events"]
    a = sorted(tuple(r) for r in sessions.session_stats(df1, ["user_id"], "ts", tie_breakers=["event_id"]).select(cols).collect())
    b = sorted(tuple(r) for r in sessions.session_stats(df2, ["user_id"], "ts", tie_breakers=["event_id"]).select(cols).collect())
    assert a == b == [(1, 1, 3), (1, 2, 1)]


def test_vocab_topn_deterministic_cut(spark):
    """Ties at the cut resolve by token asc, and ids are dense 0-based
    in (freq desc, token asc) order."""
    docs = spark.createDataFrame(
        [(1, "b b b a a c c d"), (2, "a c")], "doc_id long, text string"
    )
    # freqs: a=3, b=3, c=3, d=1 → top-3 = a, b, c (token asc among ties)
    v = {r.token: (r.freq, r.token_id) for r in text.vocab_topn(docs, "text", n=3).collect()}
    assert v == {"a": (3, 0), "b": (3, 1), "c": (3, 2)}


def test_docs_to_ids_oov_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c c d"), (2, "a c"), (3, "zz qq")],
        "doc_id long, text string",
    )
    vocab = text.vocab_topn(docs, "text", n=3)
    out = {r.doc_id: r for r in text.docs_to_ids(docs, "doc_id", "text", vocab).collect()}
    # doc 1: b b b a a c c d -> 1,1,1,0,0,2,2,-1 (d is OOV)
    assert out[1].ids_csv == "1,1,1,0,0,2,2,-1"
    assert out[1].n_tokens == 8 and out[1].n_oov == 1
    assert out[2].ids_csv == "0,2" and out[2].n_oov == 0
    # fully-OOV doc still present, all -1
    assert out[3].ids_csv == "-1,-1" and out[3].n_oov == 2


def test_docs_to_ids_empty_doc_dropped(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "   ")], "doc_id long, text string")
    vocab = text.vocab_topn(docs, "text", n=10)
    got = [r.doc_id for r in text.docs_to_ids(docs, "doc_id", "text", vocab).collect()]
    assert got == [1]
