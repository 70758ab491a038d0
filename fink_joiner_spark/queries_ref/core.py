"""Reference-parity queries (SURVEY.md §2) over the driver test tables.

The `events` table plays the role of the reference's change-log topics
(versioned rows per key); `orders`/`customer`/`supplier`/… play the
fact/dimension roles of listings/agents/offices (FIXTURES.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import dedup
from fink_joiner_spark.queries import PYSTATE_SHUFFLE_PARTITIONS, STREAM_SHUFFLE_PARTITIONS, register, stream_finish_fast, stream_state_confs

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


# ---------------------------------------------------------------------------
# P1/P2 — JSON envelope projection + nested-array extraction
# ---------------------------------------------------------------------------


@register(
    "p1_envelope_projection",
    """
    SELECT CAST(user_id AS VARCHAR) AS uc_pk,
           epoch_us(ts) AS uc_created_ts,
           event_type AS uc_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
    "Kafka-topic simulation: wrap events in the 9-field change-log envelope, "
    "parse with from_json, extract payload key (CRMLSJoiner.scala:118-155)",
)
def p1_envelope_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import projections

    ev = table(spark, sf_dir, "events")
    # Simulate the raw topic: one JSON string per record carrying the envelope.
    raw = ev.select(
        F.to_json(
            F.struct(
                F.col("props").alias("data"),
                F.col("user_id").cast("string").alias("uc_pk"),
                F.col("user_id").cast("string").alias("uc_update_ts"),
                F.lit("v1").alias("uc_version"),
                F.unix_micros("ts").alias("uc_created_ts"),
                F.lit("row").alias("uc_row_type"),
                F.col("event_type").alias("uc_type"),
                (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("uc_valid_day"),
                F.unix_micros("ts").alias("uc_valid_ts"),
            )
        ).alias("value")
    )
    parsed = projections.parse_envelope(raw, "value", payload_keys={"k_str": "$.k"})
    return parsed.select(
        "uc_pk",
        "uc_created_ts",
        "uc_type",
        F.col("k_str").cast("int").alias("k"),
    )


@register(
    "p2_nested_array_json",
    """
    SELECT event_id, CAST(user_id AS VARCHAR) AS agent_id FROM events
    """,
    "index into a JSON array inside the payload (FlinkJoiner.scala:186-190)",
)
def p2_nested_array_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import projections

    ev = table(spark, sf_dir, "events")
    nested = ev.select(
        "event_id",
        F.concat(
            F.lit('{"ActiveAgent:Agent":[{"Agent ID":"'),
            F.col("user_id").cast("string"),
            F.lit('"}]}'),
        ).alias("payload"),
    )
    out = projections.extract_nested_array(
        nested, "payload", "$['ActiveAgent:Agent'][0]['Agent ID']", "agent_id"
    )
    return out.select("event_id", "agent_id")


# ---------------------------------------------------------------------------
# P4 — flatMap tokenize + word count (WordCount.scala:40-48)
# ---------------------------------------------------------------------------


@register(
    "p4_wordcount",
    """
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    "explode(split()) word count over documents",
)
def p4_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import projections

    docs = table(spark, sf_dir, "documents")
    words = projections.flatmap_tokens(docs, "text", "word")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# P6/P7/P8 — identity view, positional rename, scalar expression
# ---------------------------------------------------------------------------


@register("p6_select_star_view", "SELECT * FROM region",
          "pass-through view registration (FlinkJoiner.scala:237-241)")
def p6_select_star_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    region.createOrReplaceTempView("region_view_p6")
    return spark.sql("SELECT * FROM region_view_p6")


@register(
    "p7_rename_columns",
    "SELECT n_nationkey AS nation_key, n_name AS nation_name, "
    "n_regionkey AS region_key FROM nation",
    "positional field naming at registration (CRMLSJoiner.scala:159-178)",
)
def p7_rename_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import projections

    nation = table(spark, sf_dir, "nation")
    return projections.rename_columns(nation, ["nation_key", "nation_name", "region_key"])


@register(
    "p8_upper_scalar",
    "SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper FROM customer",
    "scalar string function in select (FlinkJoiner_backup.txt:670)",
)
def p8_upper_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    return customer.select("c_custkey", F.upper("c_mktsegment").alias("seg_upper"))


# ---------------------------------------------------------------------------
# A3/A4 — global count over join result; keyed ordered reduce
# ---------------------------------------------------------------------------


@register(
    "a3_count_over_join",
    f"SELECT COUNT(*) AS cnt FROM ({_FLAGSHIP_ORACLE})",
    "COUNT(*) over the updating join result (CRMLSJoiner.scala:493-496)",
)
def a3_count_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import aggregates

    return aggregates.global_count(flagship_dedup_left_join(spark, sf_dir), alias="cnt")


@register(
    "a4_keyed_reduce_concat",
    """
    SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS event_seq
    FROM events GROUP BY user_id
    """,
    "keyed incremental reduce by concatenation (FlinkJoiner_backup.txt:185-193)",
)
def a4_keyed_reduce_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import aggregates

    ev = table(spark, sf_dir, "events")
    return aggregates.keyed_ordered_concat(
        ev, ["user_id"], "event_type", ["ts", "event_id"], sep="|", alias="event_seq"
    )


# ---------------------------------------------------------------------------
# A5/A6 — tumbling windows (5 s word-count window; 20 min SQL TUMBLE)
# ---------------------------------------------------------------------------


@register(
    "a5_tumbling_window_5s",
    """
    SELECT (epoch_us(ts) // 5000000) * 5000000 AS window_start_us,
           COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
    "5 s tumbling count (WordCount.scala:43-48); epoch-aligned like TUMBLE",
)
def a5_tumbling_window_5s(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import aggregates

    ev = table(spark, sf_dir, "events")
    win = aggregates.tumbling_window_agg(ev, "ts", "5 seconds")
    return win.select(F.unix_micros("window_start").alias("window_start_us"), "cnt")


@register(
    "a6_tumbling_window_20min",
    """
    SELECT (epoch_us(ts) // 1200000000) * 1200000000 AS window_start_us,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(floor(value * 100 + 0.5)::BIGINT)::BIGINT / 100.0, 2)
             AS sum_value
    FROM events GROUP BY 1, 2
    """,
    "20 min SQL TUMBLE with keyed agg (FlinkJoiner_backup.txt:653-665)",
)
def a6_tumbling_window_20min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import aggregates

    ev = table(spark, sf_dir, "events")
    win = aggregates.tumbling_window_agg(
        ev,
        "ts",
        "20 minutes",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("cnt"),
            # exact integer cents: a float SUM's last ulp differs
            # between engines and can flip a .005 rounding boundary
            # (hit live in ext_tpch_q10, round 8)
            F.round(
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0, 2
            ).alias("sum_value"),
        ],
    )
    return win.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "cnt",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# J1/J5 — 11-way LEFT OUTER star join with aliased dimension roles
# (leftJoinQuery2, CRMLSJoiner.scala:471-488)
# ---------------------------------------------------------------------------

_J1_ORACLE = """
WITH latest_li AS (
  SELECT li.* FROM lineitem li
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS l_shipdate
        FROM lineitem GROUP BY l_orderkey) m
    USING (l_orderkey, l_shipdate)
)
SELECT o.o_orderkey,
       c1.c_name AS c1_name, c2.c_name AS c2_name,
       c3.c_name AS c3_name, c4.c_name AS c4_name,
       li.l_partkey, li.l_suppkey, epoch_us(li.l_shipdate) AS ship_us,
       s1.s_name AS s1_name, s2.s_name AS s2_name,
       s3.s_name AS s3_name, s4.s_name AS s4_name,
       n.n_name AS nation_name, r.r_name AS region_name
FROM orders o
LEFT JOIN customer c1 ON o.o_custkey = c1.c_custkey
LEFT JOIN customer c2 ON o.o_custkey + 1 = c2.c_custkey
LEFT JOIN customer c3 ON o.o_custkey + 2 = c3.c_custkey
LEFT JOIN customer c4 ON o.o_custkey + 3 = c4.c_custkey
LEFT JOIN latest_li li ON o.o_orderkey = li.l_orderkey
LEFT JOIN supplier s1 ON li.l_suppkey = s1.s_suppkey
LEFT JOIN supplier s2 ON li.l_suppkey + 1 = s2.s_suppkey
LEFT JOIN supplier s3 ON li.l_suppkey + 2 = s3.s_suppkey
LEFT JOIN supplier s4 ON li.l_suppkey + 3 = s4.s_suppkey
LEFT JOIN nation n ON c1.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register(
    "j1_multiway_left_join",
    _J1_ORACLE,
    "11-way LEFT JOIN star fan-out with 4 customer roles, FK-keyed latest "
    "child (lineitem), 4 supplier roles, nation, region",
)
def j1_multiway_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan notes: one deduped lineitem snapshot reused; customer and
    supplier each loaded once and re-aliased per FK role (J5) so a single
    scan feeds 4 join edges; nation/region broadcast. The fact's hash
    partitioning on o_orderkey survives the c*-joins (they key on
    o_custkey-derived values → AQE picks broadcast at small SF; at large
    scale they shuffle once each, unavoidable for genuinely huge dims)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    lineitem = table(spark, sf_dir, "lineitem")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    latest_li = dedup.latest_per_key_all_ties(lineitem, ["l_orderkey"], "l_shipdate").alias("li")
    o = orders.alias("o")
    out = (
        o.join(customer.alias("c1"), F.expr("o.o_custkey = c1.c_custkey"), "left")
        .join(customer.alias("c2"), F.expr("o.o_custkey + 1 = c2.c_custkey"), "left")
        .join(customer.alias("c3"), F.expr("o.o_custkey + 2 = c3.c_custkey"), "left")
        .join(customer.alias("c4"), F.expr("o.o_custkey + 3 = c4.c_custkey"), "left")
        .join(latest_li, F.expr("o.o_orderkey = li.l_orderkey"), "left")
        .join(supplier.alias("s1"), F.expr("li.l_suppkey = s1.s_suppkey"), "left")
        .join(supplier.alias("s2"), F.expr("li.l_suppkey + 1 = s2.s_suppkey"), "left")
        .join(supplier.alias("s3"), F.expr("li.l_suppkey + 2 = s3.s_suppkey"), "left")
        .join(supplier.alias("s4"), F.expr("li.l_suppkey + 3 = s4.s_suppkey"), "left")
        .join(F.broadcast(nation).alias("n"), F.expr("c1.c_nationkey = n.n_nationkey"), "left")
        .join(F.broadcast(region).alias("r"), F.expr("n.n_regionkey = r.r_regionkey"), "left")
    )
    return out.select(
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.col("c1.c_name").alias("c1_name"),
        F.col("c2.c_name").alias("c2_name"),
        F.col("c3.c_name").alias("c3_name"),
        F.col("c4.c_name").alias("c4_name"),
        F.col("li.l_partkey").alias("l_partkey"),
        F.col("li.l_suppkey").alias("l_suppkey"),
        # l_shipdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
        # cast under the UTC session TZ so epoch matches DuckDB's epoch_us.
        F.unix_micros(F.col("li.l_shipdate").cast("timestamp")).alias("ship_us"),
        F.col("s1.s_name").alias("s1_name"),
        F.col("s2.s_name").alias("s2_name"),
        F.col("s3.s_name").alias("s3_name"),
        F.col("s4.s_name").alias("s4_name"),
        F.col("n.n_name").alias("nation_name"),
        F.col("r.r_name").alias("region_name"),
    )


# ---------------------------------------------------------------------------
# J4 — join-after-join via derived-table subquery (TestJoiner.scala:311-327)
# ---------------------------------------------------------------------------


@register(
    "j4_nested_join",
    """
    SELECT sub.o_orderkey, sub.c_name, n.n_name AS nation_name
    FROM (
      SELECT o.o_orderkey, c.c_name, c.c_nationkey
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ) sub
    LEFT JOIN nation n ON sub.c_nationkey = n.n_nationkey
    """,
    "nested/derived-table join through spark.sql",
)
def j4_nested_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_j4")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_j4")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_j4")
    return spark.sql(
        """
        SELECT sub.o_orderkey, sub.c_name, n.n_name AS nation_name
        FROM (
          SELECT o.o_orderkey, c.c_name, c.c_nationkey
          FROM orders_j4 o LEFT JOIN customer_j4 c ON o.o_custkey = c.c_custkey
        ) sub
        LEFT JOIN nation_j4 n ON sub.c_nationkey = n.n_nationkey
        """
    )


@register(
    "j5_self_role_join",
    """
    SELECT o.o_orderkey, ca.c_name AS primary_name, cb.c_name AS alt_name
    FROM orders o
    LEFT JOIN customer ca ON o.o_custkey = ca.c_custkey
    LEFT JOIN customer cb ON o.o_custkey + 1 = cb.c_custkey
    """,
    "same deduped dimension joined under multiple FK roles "
    "(agents aa/ab/ac/ad, CRMLSJoiner.scala:475-478)",
)
def j5_self_role_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").alias("o")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(customer.alias("ca"), F.expr("o.o_custkey = ca.c_custkey"), "left")
        .join(customer.alias("cb"), F.expr("o.o_custkey + 1 = cb.c_custkey"), "left")
        .select(
            F.col("o.o_orderkey").alias("o_orderkey"),
            F.col("ca.c_name").alias("primary_name"),
            F.col("cb.c_name").alias("alt_name"),
        )
    )


# ---------------------------------------------------------------------------
# S4 — in-memory fixture pipeline (FlinkJoiner.scala:279-313, FIXTURES.md §5):
# dedup each tiny stream to latest-per-key, 3-way left join (TestJoiner shape)
# ---------------------------------------------------------------------------

_S4_ORACLE = """
WITH listings(id, data, ts_ms) AS (VALUES
  (1, 'listing 1.0', 60000), (2, 'listing 2.0', 60000), (3, 'listing 3.0', 60000),
  (4, 'listing 4.0', 60000), (2, 'listing 2.1', 180000), (1, 'listing 1.1', 240000),
  (2, 'listing 2.1', 600000)),
images(id, data, ts_ms) AS (VALUES
  (1, 'Image 1.0', 60000), (1, 'Image 1.1', 120000), (1, 'Image 1.2', 180000),
  (2, 'Image 2.0', 180000)),
open_houses(id, data, ts_ms) AS (VALUES
  (1, 'OH 1.0', 60000), (1, 'OH 1.1', 120000), (2, 'OH 2.0', 120000)),
l AS (SELECT a.* FROM listings a
      JOIN (SELECT id, MAX(ts_ms) AS ts_ms FROM listings GROUP BY id) m USING (id, ts_ms)),
i AS (SELECT a.* FROM images a
      JOIN (SELECT id, MAX(ts_ms) AS ts_ms FROM images GROUP BY id) m USING (id, ts_ms)),
o AS (SELECT a.* FROM open_houses a
      JOIN (SELECT id, MAX(ts_ms) AS ts_ms FROM open_houses GROUP BY id) m USING (id, ts_ms))
SELECT l.id, l.data AS listing_data, l.ts_ms AS listing_ts_ms,
       i.data AS image_data, o.data AS oh_data
FROM l LEFT JOIN i ON l.id = i.id LEFT JOIN o ON l.id = o.id
"""


@register("s4_memory_fixture_pipeline", _S4_ORACLE,
          "bounded in-memory source → dedup ×3 → 3-way left join "
          "(TestJoiner.scala:298-305 over FlinkJoiner static fixtures)")
def s4_memory_fixture_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.sources import batch as mem

    t = mem.fixture_tables(spark)
    l = dedup.latest_per_key_all_ties(t["listings"], ["id"], "ts_ms").alias("l")
    i = dedup.latest_per_key_all_ties(t["images"], ["id"], "ts_ms").alias("i")
    o = dedup.latest_per_key_all_ties(t["open_houses"], ["id"], "ts_ms").alias("o")
    return (
        l.join(i, F.expr("l.id = i.id"), "left")
        .join(o, F.expr("l.id = o.id"), "left")
        .select(
            F.col("l.id").cast("int").alias("id"),
            F.col("l.data").alias("listing_data"),
            F.col("l.ts_ms").cast("int").alias("listing_ts_ms"),
            F.col("i.data").alias("image_data"),
            F.col("o.data").alias("oh_data"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — temporal (as-of) join (FlinkJoiner.scala:231-257): each 'click'
# event joins the latest 'error' event of the same user with ts <= its ts.
# U1 (temporal table function registration) is this same operator — the
# reference's only UDF-like object is system-generated from the versioned
# table; here the versioned side is an ordinary DataFrame argument.
# ---------------------------------------------------------------------------


@register(
    "j3_asof_join_inner",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           b.event_id AS err_event_id, epoch_us(b.ts) AS err_ts_us,
           ROUND(b.value, 2) AS err_value
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON p.user_id = b.user_id AND b.ts <= p.ts
    """,
    "event-time as-of join, union-tag + last-ignoreNulls window plan",
)
def j3_asof_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "click")
    build = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("err_event_id"),
            F.unix_micros("ts").alias("err_ts_us"),
            F.round("value", 2).alias("err_value"),
        )
    )
    out = asof.asof_join(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["err_event_id", "err_ts_us", "err_value"], how="inner",
    )
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "err_event_id", "err_ts_us", "err_value",
    )


@register(
    "j3_asof_join_left",
    """
    SELECT p.event_id, p.user_id,
           b.event_id AS err_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON p.user_id = b.user_id AND b.ts <= p.ts
    """,
    "left-outer as-of variant (probes with no prior version keep NULLs)",
)
def j3_asof_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "click")
    build = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "ts", F.col("event_id").alias("err_event_id"))
    )
    out = asof.asof_join(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["err_event_id"], how="left",
    )
    return out.select("event_id", "user_id", "err_event_id")


@register(
    "j3_asof_join_tolerance",
    """
    SELECT p.event_id, p.user_id, l.err_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    LEFT JOIN LATERAL (
      SELECT b.event_id AS err_event_id
      FROM events b
      WHERE b.event_type = 'error' AND b.user_id = p.user_id
        AND b.ts <= p.ts
        AND epoch_us(p.ts) - epoch_us(b.ts) <= 3600000000
      ORDER BY b.ts DESC LIMIT 1
    ) l ON true
    """,
    "as-of with 1 h staleness bound — the Flink state-TTL / watermark analog",
)
def j3_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "click")
    build = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "ts", F.col("event_id").alias("err_event_id"))
    )
    out = asof.asof_join(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["err_event_id"], how="left", tolerance=3600.0,
    )
    return out.select("event_id", "user_id", "err_event_id")


# ---------------------------------------------------------------------------
# Streaming dedup exposed to the correctness gate: a real Structured
# Streaming job (file drip-feed, AvailableNow, foreachBatch snapshot
# upserts) whose FINAL SNAPSHOT must hash-match the batch dedup oracle —
# the strongest possible claim that streaming and batch agree (A1/T6).
# ---------------------------------------------------------------------------


@register(
    "stream_dedup_snapshot",
    _A1_ORACLE,
    "Structured Streaming incremental snapshot maintenance; final "
    "snapshot == batch latest-per-key (CRMLSJoiner dedup, streaming mode)",
)
def stream_dedup_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming.dedup_stream import SnapshotStore, run_dedup_stream

    ev = table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="fjs_stream_dedup_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, ev, f"{work}/stage", "ts", n_files=2)
        store = SnapshotStore(f"{work}/snap", ["user_id"], "ts", ["event_id"])
        run_dedup_stream(stream, store).awaitTermination()
    snap = store.read(spark)
    return snap.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "props",
    )


# ---------------------------------------------------------------------------
# M4 — custom stateful streaming operators exposed to the correctness
# gate. Both run real applyInPandasWithState jobs over an event-ordered
# drip feed, so their results are SQL-checkable: streaming as-of ==
# batch as-of; streaming running-reduce final == batch ordered fold.
# ---------------------------------------------------------------------------


@register(
    "stream_asof_stateful",
    """
    SELECT p.event_id, b.event_id AS err_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON p.user_id = b.user_id AND b.ts <= p.ts
    """,
    "streaming as-of via per-key version-history state "
    "(applyInPandasWithState), event-ordered replay",
)
def stream_asof_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming import stateful

    ev = table(spark, sf_dir, "events").withColumn("ts_s", F.col("ts").cast("double"))
    probe = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_s")
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts_s", F.col("event_id").alias("b_id")
    )
    tagged = stateful.tag_streams(
        probe, build, on="user_id", probe_ts="ts_s", build_ts="ts_s", build_cols=["b_id"]
    )
    work = tempfile.mkdtemp(prefix="fjs_stream_asof_")
    with stream_state_confs(spark, PYSTATE_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, tagged, f"{work}/stage", "ts", n_files=2)
        out = stateful.streaming_asof_join(stream)
        q = (
            out.writeStream.format("memory").queryName("q_stream_asof")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.sql("SELECT * FROM q_stream_asof").select(
        F.get_json_object("probe_json", "$.event_id").cast("long").alias("event_id"),
        F.get_json_object("build_json", "$.b_id").cast("long").alias("err_event_id"),
    )


@register(
    "stream_keyed_reduce",
    """
    SELECT user_id AS k, string_agg(event_type, '|' ORDER BY ts, event_id) AS reduced
    FROM events GROUP BY user_id
    """,
    "streaming running per-key fold (applyInPandasWithState, update mode); "
    "final accumulator == batch ordered concat",
)
def stream_keyed_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming import stateful

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    work = tempfile.mkdtemp(prefix="fjs_stream_reduce_")
    with stream_state_confs(spark, PYSTATE_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, ev, f"{work}/stage", "ts", n_files=2)
        out = stateful.streaming_keyed_reduce(
            stream, "user_id", "event_type", ["ts", "event_id"], sep="|"
        )
        q = (
            out.writeStream.format("memory").queryName("q_stream_reduce")
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.sql(
        """SELECT k, reduced FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY n_items DESC) rn
             FROM q_stream_reduce) WHERE rn = 1"""
    )


@register(
    "stream_dedup_tws_retract",
    """
    SELECT user_id AS k, epoch_us(ts) AS ts_us, event_id AS seq,
           event_type AS payload
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) rn
          FROM events) WHERE rn = 1
    """,
    "latest-per-key dedup with retract changelog on the Spark 4 "
    "transformWithState API (ValueState + TTL; auto-falls back to "
    "applyInPandasWithState where protobuf is absent, e.g. this "
    "container); replayed changelog == batch latest-per-key snapshot",
)
def stream_dedup_tws_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming import stateful

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="fjs_stream_tws_")
    with stream_state_confs(spark, PYSTATE_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, ev, f"{work}/stage", "ts_us", n_files=2)
        out = stateful.streaming_dedup_retract(
            stream, "user_id", "ts_us", "event_id", "event_type"
        )
        q = (
            out.writeStream.format("memory").queryName("q_stream_tws")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    # replay the changelog: rows whose inserts outnumber retracts form
    # the final snapshot (proves retract fidelity, not just the winner).
    return spark.sql(
        """SELECT k, ts_us, seq, payload FROM q_stream_tws
           GROUP BY k, ts_us, seq, payload
           HAVING SUM(CASE WHEN is_retract THEN -1 ELSE 1 END) > 0"""
    )


# ---------------------------------------------------------------------------
# The complete CRMLS pipeline analog, batch and streaming — P1 envelope
# parse → A1 dedup by uc_pk → J1 left-join — the reference's production
# job (CRMLSJoiner.scala:93-489) end-to-end through the envelope path.
# ---------------------------------------------------------------------------

_E2E_ORACLE = """
WITH latest AS (
  SELECT e.* FROM events e
  JOIN (SELECT user_id, MAX(ts) AS ts FROM events GROUP BY user_id) m
    USING (user_id, ts)
)
SELECT CAST(l.user_id AS VARCHAR) AS uc_pk,
       epoch_us(l.ts) AS uc_created_ts,
       l.event_type AS uc_type,
       CAST(json_extract_string(l.props, '$.k') AS INT) AS k,
       c.c_name, n.n_name AS nation_name
FROM latest l
LEFT JOIN customer c ON l.user_id = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


@register(
    "crmls_envelope_e2e",
    _E2E_ORACLE,
    "full production-pipeline analog: raw JSON topic → envelope parse "
    "(P1) → latest-per-uc_pk dedup (A1) → dimension left joins (J1)",
)
def crmls_envelope_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import projections

    ev = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    # 1. simulate the raw Kafka topic: JSON envelope string per record
    raw = ev.select(
        F.to_json(
            F.struct(
                F.col("props").alias("data"),
                F.col("user_id").cast("string").alias("uc_pk"),
                F.col("user_id").cast("string").alias("uc_update_ts"),
                F.lit("v1").alias("uc_version"),
                F.unix_micros("ts").alias("uc_created_ts"),
                F.lit("row").alias("uc_row_type"),
                F.col("event_type").alias("uc_type"),
                (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("uc_valid_day"),
                F.unix_micros("ts").alias("uc_valid_ts"),
            )
        ).alias("value")
    )
    # 2. P1: envelope projection with payload key extraction
    parsed = projections.parse_envelope(raw, "value", payload_keys={"k_str": "$.k"})
    # 3. A1: latest version per primary key (reference tie semantics)
    latest = dedup.latest_per_key_all_ties(parsed, ["uc_pk"], "uc_created_ts")
    # 4. J1: left-join the latest snapshot against dimensions
    return (
        latest.join(
            customer, latest.uc_pk.cast("long") == customer.c_custkey, "left"
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            "uc_pk",
            "uc_created_ts",
            "uc_type",
            F.col("k_str").cast("int").alias("k"),
            "c_name",
            F.col("n_name").alias("nation_name"),
        )
    )


@register(
    "stream_snapshot_join_pipeline",
    """
    WITH lc AS (
      SELECT e.* FROM events e
      JOIN (SELECT user_id, MAX(ts) AS ts FROM events
            WHERE event_type = 'click' GROUP BY user_id) m USING (user_id, ts)
      WHERE e.event_type = 'click'
    ),
    le AS (
      SELECT e.* FROM events e
      JOIN (SELECT user_id, MAX(ts) AS ts FROM events
            WHERE event_type = 'error' GROUP BY user_id) m USING (user_id, ts)
      WHERE e.event_type = 'error'
    )
    SELECT lc.event_id, lc.user_id, le.event_id AS err_event_id
    FROM lc LEFT JOIN le ON lc.user_id = le.user_id
    """,
    "streaming CRMLS job shape: two drip-fed versioned streams → "
    "incremental snapshot maintenance → snapshot left join; final "
    "result == batch dedup+join",
)
def stream_snapshot_join_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming.pipeline import StreamDef, run_snapshot_join_pipeline

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_event_id"),
    )
    work = tempfile.mkdtemp(prefix="fjs_pipe_")
    streams = [
        StreamDef("clicks", file_drip_feed(spark, clicks, f"{work}/s1", "ts", 2),
                  ["user_id"], "ts", ["event_id"]),
        StreamDef("errors", file_drip_feed(spark, errors, f"{work}/s2", "e_ts", 2),
                  ["e_user_id"], "e_ts", ["e_event_id"]),
    ]

    def join_fn(snaps):
        c, e = snaps["clicks"], snaps["errors"]
        return c.join(e, c.user_id == e.e_user_id, "left").select(
            "event_id", "user_id", F.col("e_event_id").alias("err_event_id")
        )

    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stores = run_snapshot_join_pipeline(spark, streams, join_fn, work)
    return stores["result"].read(spark)


# ---------------------------------------------------------------------------
# T5 extensions — sliding and session windows ("free extensions" per
# SURVEY §2.5: window(dur, slide) / session_window). Oracles rebuild the
# same window assignment arithmetic / gap-islands in ANSI SQL.
# ---------------------------------------------------------------------------


@register(
    "t5_sliding_window",
    """
    WITH assigned AS (
      SELECT e.event_type,
             ((epoch_us(e.ts) // 300000000) * 300000000 - i.i * 300000000)
               AS window_start_us,
             epoch_us(e.ts) AS t
      FROM events e
      CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS i) i
    )
    SELECT window_start_us, event_type, COUNT(*) AS cnt
    FROM assigned
    WHERE t < window_start_us + 600000000 AND t >= window_start_us
    GROUP BY 1, 2
    """,
    "sliding window (10 min length / 5 min slide) keyed count — "
    "window(ts, dur, slide), epoch-aligned like Flink SLIDE",
)
def t5_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(
        F.window(F.col("ts"), "10 minutes", "5 minutes"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "cnt",
    )


@register(
    "t5_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us, COUNT(*) AS cnt
    FROM sessions GROUP BY user_id, session_id
    """,
    "session windows (10 min inactivity gap) per user — "
    "session_window(); oracle via gap-islands SQL",
)
def t5_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(
        F.session_window(F.col("ts"), "10 minutes"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return out.select(
        F.col("user_id"),
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        "cnt",
    )


# ---------------------------------------------------------------------------
# Streaming windowed word count (WordCount.scala:26-58, A5/T5 in
# streaming mode): drip-fed docs → explode words with synthetic event
# times → watermarked 5 s tumbling count. Complete output mode: the
# memory sink holds the full window state after the final micro-batch,
# so the streaming result equals the batch/SQL answer exactly (append-
# mode finalization semantics are pinned separately by
# tests/test_streaming.py::test_watermark_drops_late_rows).
# ---------------------------------------------------------------------------


@register(
    "stream_windowed_wordcount",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents
    )
    SELECT ((doc_id % 60) // 5) * 5000000 AS window_start_us, word,
           COUNT(*) AS cnt
    FROM words WHERE word <> '' GROUP BY 1, 2
    """,
    "Structured Streaming watermarked tumbling word count (append "
    "mode); sentinel-flushed so streaming == batch oracle exactly",
)
def stream_windowed_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.operators import projections
    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming.windows import windowed_count

    docs = table(spark, sf_dir, "documents")
    # synthetic event time: second doc_id % 60 → deterministic windows
    timed = docs.select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.col("doc_id") % 60).alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="fjs_stream_wc_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, timed, f"{work}/stage", "ts", n_files=3)
        words = stream.select(
            "ts", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        ).filter(F.col("word") != "")
        out = windowed_count(words, "ts", "5 seconds", keys=["word"],
                             lateness="100 seconds")
        q = (
            out.writeStream.format("memory").queryName("q_stream_wc")
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    res = spark.sql("SELECT * FROM q_stream_wc")
    return res.select(
        F.unix_micros("window_start").alias("window_start_us"), "word", "cnt"
    )


@register(
    "stream_running_count",
    "SELECT COUNT(*) AS cnt FROM events",
    "A3 streaming: complete-mode global COUNT(*) over the drip-fed "
    "stream; final emission == batch count",
)
def stream_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed

    ev = table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="fjs_stream_cnt_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, ev, f"{work}/stage", "ts", n_files=3)
        out = stream.agg(F.count(F.lit(1)).alias("cnt"))
        q = (
            out.writeStream.format("memory").queryName("q_stream_cnt")
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.sql("SELECT * FROM q_stream_cnt")


@register(
    "stream_proctime_window",
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
    "T4 proctime: processing-time tumbling pre-aggregation "
    "(current_timestamp() pinned per micro-batch) rolled up over the "
    "wall-clock window bounds — the rollup erases the nondeterministic "
    "boundaries, so the pipeline is oracle-checkable end to end",
)
def stream_proctime_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (`'proctime.proctime`, FlinkJoiner_backup.txt:181,195): the
    drip-fed events stream gets a processing-time attribute and a 10 s
    proctime tumbling count per event_type (complete mode, state keyed
    by wall-clock window); a batch rollup then sums across windows —
    the standard proctime-window-as-incremental-preagg pattern, with a
    deterministic final answer (COUNT per event_type) regardless of
    how the wall clock sliced the batches."""
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed
    from fink_joiner_spark.streaming.windows import proctime_windowed_count

    ev = table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="fjs_stream_proc_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, ev, f"{work}/stage", "ts", n_files=3)
        out = proctime_windowed_count(stream, "10 seconds", keys=["event_type"])
        q = (
            out.writeStream.format("memory").queryName("q_stream_proc")
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return (
        spark.sql("SELECT * FROM q_stream_proc")
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Free-extension SQL surface (SURVEY §2.4 notes these are absent from
# the reference but come free with Spark SQL — declared + gated here so
# the engine's surface is a strict superset): top-k per group, set
# operations, CUBE/ROLLUP, pivot.
# ---------------------------------------------------------------------------


@register(
    "ext_topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 2) AS total_price, rk
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 3
    """,
    "top-3 orders per market segment (window rank, deterministic ties)",
)
def ext_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rk",
        )
    )


@register(
    "ext_set_ops",
    """
    SELECT user_id, 'both' AS src FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, 'click_only' AS src FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    """,
    "set operations (INTERSECT / EXCEPT / UNION ALL) over user sets",
)
def ext_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    erring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = clickers.intersect(erring).withColumn("src", F.lit("both"))
    only = clickers.exceptAll(erring).withColumn("src", F.lit("click_only"))
    return both.unionByName(only)


@register(
    "ext_cube_count",
    """
    SELECT event_type,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_num,
           COUNT(*) AS cnt
    FROM events
    GROUP BY CUBE (event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT))
    """,
    "CUBE grouping sets over (event_type, day)",
)
def ext_cube_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    day = (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day_num")
    return ev.select("event_type", day).cube("event_type", "day_num").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "ext_pivot_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup
    FROM events GROUP BY user_id
    """,
    "pivot: per-user event-type count matrix",
)
def ext_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    kinds = ["click", "view", "error", "purchase", "signup"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


# ---------------------------------------------------------------------------
# Stream-static join: the streaming fact joins a STATIC dimension
# snapshot inside the streaming query — stateless (no join state at
# all), and the production-correct shape for slowly-changing dims.
# This is the third join execution mode next to batch (J1) and
# snapshot-join (stream_snapshot_join_pipeline).
# ---------------------------------------------------------------------------


@register(
    "stream_static_join",
    """
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
    "stream-static left join (stateless dimension enrichment in-stream); "
    "appended output == batch join",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    customer = table(spark, sf_dir, "customer")
    work = tempfile.mkdtemp(prefix="fjs_stream_static_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, ev, f"{work}/stage", "ts", n_files=3)
        joined = stream.join(
            F.broadcast(customer), stream.user_id == customer.c_custkey, "left"
        ).select("event_id", "user_id", "c_name", "c_mktsegment")
        q = (
            joined.writeStream.format("memory").queryName("q_stream_static")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.sql("SELECT * FROM q_stream_static")


@register(
    "ext_semi_anti_join",
    """
    SELECT 'with_orders' AS kind, COUNT(*) AS cnt FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS kind, COUNT(*) AS cnt FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "LEFT SEMI + LEFT ANTI joins (existence filters without row "
    "duplication — the scalable EXISTS/NOT EXISTS plan)",
)
def ext_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cond = customer.c_custkey == orders.o_custkey
    semi = customer.join(orders, cond, "left_semi").agg(
        F.lit("with_orders").alias("kind"), F.count(F.lit(1)).alias("cnt")
    )
    anti = customer.join(orders, cond, "left_anti").agg(
        F.lit("without_orders").alias("kind"), F.count(F.lit(1)).alias("cnt")
    )
    return semi.select("kind", "cnt").unionByName(anti.select("kind", "cnt"))


@register(
    "ext_rollup_totals",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP hierarchy totals (complements ext_cube_count's full cube)",
)
def ext_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "cnt",
        )
    )


@register(
    "ext_window_analytics",
    """
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
           LEAD(event_type) OVER w AS next_type,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
           ROUND(AVG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3_cents
    FROM (SELECT *, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "analytic window functions (lag/lead/running sum/moving average) — "
    "one shuffle on user_id serves all four frames",
)
def ext_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").withColumn(
        # exact integer cents: window sums/averages are then bitwise
        # reproducible across engines (float frame arithmetic is not —
        # incremental-subtract vs recompute differs in the last ulp)
        "cents",
        F.round(F.col("value") * 100, 0).cast("long"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running_cents"),
        F.round(F.avg("cents").over(w.rowsBetween(-2, 0)), 4).alias("ma3_cents"),
    )


@register(
    "ext_global_sort_topn",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
    FROM lineitem
    ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    "global ORDER BY + LIMIT: planner uses TakeOrderedAndProject "
    "(per-partition top-N + driver merge — no total sort, no full "
    "range-partition exchange at any scale)",
)
def ext_global_sort_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
        )
        .orderBy(F.desc("revenue"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "ext_tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           ROUND(SUM(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT
                 / 100.0, 2) AS sum_base_price,
           ROUND(SUM(floor(l_extendedprice * (1 - l_discount) * 100
                           + 0.5)::BIGINT)::BIGINT / 100.0, 2) AS sum_disc_price,
           ROUND(SUM(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                           + 0.5)::BIGINT)::BIGINT / 100.0, 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(SUM(floor(l_discount * 1000000 + 0.5)::BIGINT)::BIGINT
                 / 1000000.0 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: the canonical scan-heavy partial-agg "
    "benchmark (map-side combine; 6 aggregates in one pass)",
)
def ext_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            # money sums in exact integer cents (cross-engine float-SUM
            # ulp can flip a rounding boundary — hit live in q10, r8)
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
                / 100.0, 2,
            ).alias("sum_base_price"),
            F.round(
                F.sum(F.floor(disc_price * 100 + 0.5).cast("long")) / 100.0, 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.floor(disc_price * (1 + F.col("l_tax")) * 100 + 0.5).cast(
                        "long"
                    )
                )
                / 100.0, 2,
            ).alias("sum_charge"),
            # avg_qty: quantities are integral, their double SUM is
            # exact at any order — safe to AVG directly. avg_disc is
            # an order-dependent float sum -> exact micro-units
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(F.floor(F.col("l_discount") * 1e6 + 0.5).cast("long"))
                / 1e6 / F.count(F.lit(1)), 6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "ext_interval_join_banded",
    """
    SELECT a.event_id AS err_id, b.event_id AS click_id,
           epoch_us(a.ts) - epoch_us(b.ts) AS delta_us
    FROM events a JOIN events b
      ON a.event_type = 'error' AND b.event_type = 'click'
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 30000000
    """,
    "pure range-predicate (interval) join via bin-banding: 3x bin "
    "replication + equi-join + exact refilter — no cartesian product "
    "(Spark has no native range-join strategy; plan-audited)",
)
def ext_interval_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators.rangejoin import banded_interval_join

    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.unix_micros("ts").alias("err_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.unix_micros("ts").alias("click_us")
    )
    joined = banded_interval_join(errors, clicks, "err_us", "click_us", 30_000_000)
    return joined.select(
        "err_id", "click_id", (F.col("err_us") - F.col("click_us")).alias("delta_us")
    )


@register(
    "ext_udtf_lateral_shingles",
    r"""
    SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle,
           CAST(i - 1 AS INT) AS pos
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents WHERE doc_id < 25),
         UNNEST(generate_series(1, len(toks) - 2)) AS t(i)
    """,
    "Python UDTF (@udtf) invoked through SQL LATERAL — the generic "
    "table-function surface the reference's LATERAL TABLE(JoinAgents) "
    "belongs to (FlinkJoiner.scala:246)",
)
def ext_udtf_lateral_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.functions import register_all

    register_all(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """SELECT d.doc_id, s.shingle, s.pos
           FROM documents_udtf d, LATERAL shingles(d.text) s
           WHERE d.doc_id < 25"""
    )


@register(
    "stream_stream_interval_join",
    """
    SELECT c.event_id AS click_id, e.event_id AS err_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS delta_us
    FROM events c JOIN events e
      ON c.event_type = 'click' AND e.event_type = 'error'
     AND c.user_id = e.user_id
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    "true stream-stream inner join with watermarks on both sides and a "
    "time-range condition (join state GC'd by watermark - the "
    "Structured Streaming native path, complementing the snapshot-join "
    "architecture); appended result == batch interval join",
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    work = tempfile.mkdtemp(prefix="fjs_ss_join_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        sc = file_drip_feed(spark, clicks, f"{work}/c", "c_ts", n_files=2).withWatermark(
            "c_ts", "1 hour"
        )
        se = file_drip_feed(spark, errors, f"{work}/e", "e_ts", n_files=2).withWatermark(
            "e_ts", "1 hour"
        )
        joined = sc.join(
            se,
            F.expr(
                "c_user = e_user AND e_ts >= c_ts "
                "AND e_ts <= c_ts + INTERVAL 30 MINUTES"
            ),
            "inner",
        ).select(
            "click_id", "err_id",
            (F.unix_micros("e_ts") - F.unix_micros("c_ts")).alias("delta_us"),
        )
        q = (
            joined.writeStream.format("memory").queryName("q_ss_join")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.sql("SELECT * FROM q_ss_join")


@register(
    "stream_dedup_within_watermark",
    """
    SELECT event_id, COUNT(*)::BIGINT AS n
    FROM events GROUP BY event_id
    """,
    "built-in streaming exact dedup with state TTL "
    "(dropDuplicatesWithinWatermark): the stream replays every event "
    "TWICE; the engine keeps dedup state only within the watermark "
    "delay and must still emit each event exactly once",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in answer to unbounded-dedup-state: unlike
    ``dropDuplicates`` (state grows forever) the WithinWatermark form
    GCs per-key state once the watermark passes it — the only exact
    streaming dedup that survives 100 TB of stream history. The replay
    feeds each event twice (two interleaved copies inside the
    watermark), so any state mishandling double-emits and flips n to 2.
    """
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed

    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    doubled = ev.unionByName(ev)  # every event arrives twice
    work = tempfile.mkdtemp(prefix="fjs_stream_ddww_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS), \
            stream_finish_fast(spark):
        stream = file_drip_feed(spark, doubled, f"{work}/stage", "ts", n_files=3)
        deduped = (
            stream.withWatermark("ts", "100 seconds")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName("q_stream_ddww")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT event_id, COUNT(*) AS n FROM q_stream_ddww GROUP BY event_id"
    )


@register(
    "j3_asof_join_nearest",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT event_id AS b_id, user_id, ts AS bts FROM events WHERE event_type = 'error'),
    j AS (
      SELECT p.event_id, p.user_id,
             epoch_us(p.ts) AS p_ts_us,
             b.b_id, epoch_us(b.bts) AS b_ts_us,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(p.ts) - epoch_us(b.bts)),
                        CASE WHEN b.bts <= p.ts THEN 0 ELSE 1 END,
                        b.b_id
             ) AS rn
      FROM p JOIN b USING (user_id)
    )
    SELECT event_id, user_id, p_ts_us,
           b_id AS near_event_id, b_ts_us AS near_ts_us
    FROM j WHERE rn = 1
    """,
    "bidirectional as-of join (merge_asof direction='nearest'): each "
    "click joins the error with the smallest |ts delta| for its user, "
    "ties toward the backward version; union-tag plan, one keyed "
    "shuffle, two window passes over one sort — no pair explosion",
)
def j3_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    out = asof.asof_join_nearest(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["b_id", "b_ts"], how="inner",
    )
    return out.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("p_ts_us"),
        F.col("b_id").alias("near_event_id"),
        F.unix_micros("b_ts").alias("near_ts_us"),
    )


@register(
    "stream_stream_interval_join_left",
    """
    SELECT c.event_id AS click_id, e.event_id AS err_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS delta_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    "stream-stream LEFT OUTER interval join: unmatched clicks are held "
    "in state and emitted with NULLs only after the watermark proves no "
    "in-range error can still arrive — the late-null-emission contract "
    "that distinguishes outer streaming joins; appended result == batch "
    "left interval join",
)
def stream_stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fink_joiner_spark.sources.streaming import file_drip_feed

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    # Outer-join nulls are only emitted once the watermark PROVES no
    # in-range match can arrive; under AvailableNow the final watermark
    # stops `delay` behind the last event, permanently withholding the
    # tail's unmatched rows. Append one far-future sentinel per side
    # (non-joinable key, filtered from the output) so the watermark
    # passes every real event — the batch-replay analog of the idle-
    # source watermark advancement a production job gets from time.
    far = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 12 HOURS")).alias("ts")
    ).collect()[0]["ts"]
    clicks = clicks.unionByName(
        spark.createDataFrame([(-1, -1, far)], clicks.schema)
    )
    errors = errors.unionByName(
        spark.createDataFrame([(-2, -2, far)], errors.schema)
    )
    work = tempfile.mkdtemp(prefix="fjs_ss_ljoin_")
    with stream_state_confs(spark, STREAM_SHUFFLE_PARTITIONS):
        sc = file_drip_feed(spark, clicks, f"{work}/c", "c_ts", n_files=2).withWatermark(
            "c_ts", "1 hour"
        )
        se = file_drip_feed(spark, errors, f"{work}/e", "e_ts", n_files=2).withWatermark(
            "e_ts", "1 hour"
        )
        joined = sc.join(
            se,
            F.expr(
                "c_user = e_user AND e_ts >= c_ts "
                "AND e_ts <= c_ts + INTERVAL 30 MINUTES"
            ),
            "leftOuter",
        ).select(
            "click_id", "err_id",
            (F.unix_micros("e_ts") - F.unix_micros("c_ts")).alias("delta_us"),
        )
        q = (
            joined.writeStream.format("memory").queryName("q_ss_ljoin")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.sql("SELECT * FROM q_ss_ljoin WHERE click_id >= 0")


@register(
    "j3_asof_cogroup",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           b.event_id AS err_event_id, epoch_us(b.ts) AS err_ts_us,
           ROUND(b.value, 2) AS err_value
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON p.user_id = b.user_id AND b.ts <= p.ts
    """,
    "the SAME as-of join through cogroup().applyInPandas "
    "(pandas.merge_asof per key, Arrow-batched) — the imperative "
    "alternative when per-key logic outgrows SQL; identical oracle to "
    "j3_asof_join_inner proves the two implementations agree",
)
def j3_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fink_joiner_spark.operators import asof

    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.col("event_id").alias("err_event_id"),
        F.unix_micros("ts").alias("err_ts_us"),
        F.round("value", 2).alias("err_value"),
    )
    out = asof.asof_join_cogrouped(
        probe, build, on="user_id", probe_ts="ts", build_ts="ts",
        build_cols=["err_event_id", "err_ts_us", "err_value"],
    )
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "err_event_id", "err_ts_us", "err_value",
    )
