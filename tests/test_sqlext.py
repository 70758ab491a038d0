"""SQL macro layer: LATEST_BY expansion + the LATERAL as-of recipe."""

from __future__ import annotations

from fink_joiner_spark import sqlext
from fink_joiner_spark.catalog import load_tables


def test_latest_by_macro_equals_operator(spark, sf_dir):
    load_tables(spark, sf_dir, ("events",))
    out = sqlext.sql(
        spark,
        "SELECT user_id, event_id FROM LATEST_BY(events BY user_id ORDER BY ts, event_id)",
    )
    from pyspark.sql import functions as F

    from fink_joiner_spark.catalog import table
    from fink_joiner_spark.operators import dedup

    want = dedup.latest_per_key(
        table(spark, sf_dir, "events"), ["user_id"], "ts", tie_breakers=["event_id"]
    ).select("user_id", "event_id")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in want.collect()}
    # the helper rank column must not leak
    assert "__fjs_rn" not in out.columns


def test_plain_sql_passes_through_untouched(spark):
    q = "SELECT 1 AS latest_by_x, 'LATEST_BY' AS s"
    assert sqlext.expand_macros(q) == q
    assert sqlext.sql(spark, q).first()["latest_by_x"] == 1


def test_multiple_macros_and_multi_key(spark, sf_dir):
    load_tables(spark, sf_dir, ("events",))
    out = sqlext.sql(
        spark,
        """
        SELECT a.user_id, COUNT(*) AS n
        FROM LATEST_BY(events BY user_id, event_type ORDER BY ts, event_id) a
        JOIN LATEST_BY(events BY user_id ORDER BY ts, event_id) b
          ON a.user_id = b.user_id
        GROUP BY a.user_id
        """,
    )
    # one latest row per (user, type) joined to one per user: n = #types
    rows = out.collect()
    assert len(rows) > 0 and all(1 <= r["n"] <= 5 for r in rows)


def test_lateral_asof_recipe_matches_operator(spark, sf_dir):
    """The documented LATERAL one-liner must agree with the operator
    (small-data recipe; asof_join is the scale path)."""
    from pyspark.sql import functions as F

    from fink_joiner_spark.catalog import table
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    ev.filter(F.col("event_type") == "click").createOrReplaceTempView("p_click")
    ev.filter(F.col("event_type") == "error").createOrReplaceTempView("b_err")
    lat = sqlext.sql(
        spark,
        """
        SELECT p.event_id, l.err_id FROM p_click p,
        LATERAL (SELECT event_id AS err_id FROM b_err b
                 WHERE b.user_id = p.user_id AND b.ts <= p.ts
                 ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) l
        """,
    )
    probe = ev.filter(F.col("event_type") == "click")
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    want = asof.asof_join(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["err_id"], how="inner",
    ).select("event_id", "err_id")
    assert {tuple(r) for r in lat.collect()} == {tuple(r) for r in want.collect()}


def test_macro_never_rewrites_string_literals(spark):
    q = "SELECT 'LATEST_BY(t BY k ORDER BY ts)' AS doc, `select` FROM (SELECT 1 AS `select`)"
    out = sqlext.sql(spark, q).first()
    assert out["doc"] == "LATEST_BY(t BY k ORDER BY ts)"
    # doubled-quote escape inside a literal stays intact too
    q2 = "SELECT 'it''s LATEST_BY(t BY k ORDER BY ts)' AS s"
    assert sqlext.sql(spark, q2).first()["s"] == "it's LATEST_BY(t BY k ORDER BY ts)"


def test_scanner_identity_on_macro_free_sql():
    """Property: any SQL without a macro outside literals round-trips
    byte-identical through expand_macros — including quote soup."""
    from hypothesis import given, settings, strategies as st

    chars = st.text(alphabet="ab '\"`()BYORDER,x1_", max_size=60)

    @settings(max_examples=200, deadline=None)
    @given(chars)
    def check(q):
        if "LATEST_BY" in q.upper():
            return  # macro may legitimately rewrite
        assert sqlext.expand_macros(q) == q

    check()
