"""Reference-parity queries (SURVEY.md §2) over the driver test tables.

The `events` table plays the role of the reference's change-log topics
(versioned rows per key); `orders`/`customer`/`supplier`/… play the
fact/dimension roles of listings/agents/offices (FIXTURES.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import dedup
from fink_joiner_spark.queries import register

# ---------------------------------------------------------------------------
# A1/A2 — latest-version-per-key dedup (CRMLSJoiner.scala:182)
# ---------------------------------------------------------------------------

_A1_ORACLE = """
SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.user_id, e.event_type,
       ROUND(e.value, 2) AS value, e.props
FROM events e
JOIN (SELECT user_id, MAX(ts) AS ts FROM events GROUP BY user_id) m
  USING (user_id, ts)
"""


@register("a1_dedup_latest_per_key", _A1_ORACLE,
          "latest event per user_id; IN-subquery tie semantics")
def a1_dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    latest = dedup.latest_per_key_all_ties(ev, ["user_id"], "ts")
    return latest.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "props",
    )


@register("a1_dedup_window_form", _A1_ORACLE,
          "same dedup via row_number window (tie-broken; equal when ts unique)")
def a1_dedup_window_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    latest = dedup.latest_per_key(ev, ["user_id"], "ts", tie_breakers=["event_id"])
    return latest.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "props",
    )


@register(
    "a2_group_max",
    "SELECT user_id, epoch_us(MAX(ts)) AS max_ts_us FROM events GROUP BY user_id",
    "bare grouped MAX (the dedup subquery)",
)
def a2_group_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    agg = dedup.group_max(ev, ["user_id"], "ts", alias="max_ts")
    return agg.select("user_id", F.unix_micros("max_ts").alias("max_ts_us"))


@register("p5_tuple_in_subquery", _A1_ORACLE,
          "literal tuple-IN SQL through spark.sql (Catalyst subquery rewrite)")
def p5_tuple_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    latest = dedup.latest_per_key_sql(ev, "events_p5", ["user_id"], "ts")
    return latest.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "props",
    )


# ---------------------------------------------------------------------------
# J2 — inner equi-join (FlinkJoiner.scala:246-257 / TestJoiner.scala:255-265)
# ---------------------------------------------------------------------------


@register(
    "j2_inner_join",
    """
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS total_price,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "inner equi-join fact→dimension",
)
def j2_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "c_name",
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# Flagship: the CRMLS pipeline analog — dedup the versioned stream, then
# left-join the latest snapshot against dimensions (CRMLSJoiner.scala:471-489)
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH latest AS (
  SELECT e.* FROM events e
  JOIN (SELECT user_id, MAX(ts) AS ts FROM events GROUP BY user_id) m
    USING (user_id, ts)
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.event_type,
       c.c_name, c.c_mktsegment, n.n_name AS nation_name, r.r_name AS region_name
FROM latest l
LEFT JOIN customer c ON l.user_id = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("flagship_dedup_left_join", _FLAGSHIP_ORACLE,
          "dedup→multi-way left join; the reference's core pipeline shape")
def flagship_dedup_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    latest = dedup.latest_per_key_all_ties(ev, ["user_id"], "ts")
    # nation/region are tiny dimensions at any scale → broadcast;
    # customer is broadcastable at test SF and AQE decides on-cluster.
    return (
        latest.join(customer, latest.user_id == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
