"""Churn test for the FULL-WIDTH (11-way) streaming snapshot-join.

The reference's production job joins six deduped streams through an
11-edge LEFT-JOIN star (``CRMLSJoiner.scala:471-488``); its output is a
retract stream. The 3-way analog is covered in test_streaming.py; this
test drives the full-width shape through ``run_snapshot_join_pipeline``
TWICE — run 1 with base data, run 2 with an update touching EVERY
entity role (orders re-keyed, customer renamed + re-nationed, supplier
renamed, a later lineitem child re-supplied, nation re-regioned, region
renamed) — and asserts:

1. the maintained join snapshot equals the batch dedup+join over all
   data (latest version per entity);
2. the per-run retract changelogs replay (inserts minus retracts, as
   multisets) to exactly that snapshot.
"""

from __future__ import annotations

import collections
import os

from pyspark.sql import functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import dedup
from fink_joiner_spark.streaming.pipeline import StreamDef, run_snapshot_join_pipeline

OUT_COLS = [
    "o_orderkey",
    "c1_name",
    "c2_name",
    "c3_name",
    "c4_name",
    "l_suppkey",
    "s1_name",
    "s2_name",
    "s3_name",
    "s4_name",
    "nation_name",
    "region_name",
]


def _join11(snaps):
    """The 11-edge star over the maintained snapshots (same shape as
    queries_ref.core.j1_multiway_left_join, minus the lineitem dedup —
    the lineitem store already keeps latest-per-order)."""
    o = snaps["orders"].alias("o")
    c = snaps["customer"]
    s = snaps["supplier"]
    li = snaps["lineitem"].alias("li")
    n = snaps["nation"].alias("n")
    r = snaps["region"].alias("r")
    out = (
        o.join(c.alias("c1"), F.expr("o.o_custkey = c1.c_custkey"), "left")
        .join(c.alias("c2"), F.expr("o.o_custkey + 1 = c2.c_custkey"), "left")
        .join(c.alias("c3"), F.expr("o.o_custkey + 2 = c3.c_custkey"), "left")
        .join(c.alias("c4"), F.expr("o.o_custkey + 3 = c4.c_custkey"), "left")
        .join(li, F.expr("o.o_orderkey = li.l_orderkey"), "left")
        .join(s.alias("s1"), F.expr("li.l_suppkey = s1.s_suppkey"), "left")
        .join(s.alias("s2"), F.expr("li.l_suppkey + 1 = s2.s_suppkey"), "left")
        .join(s.alias("s3"), F.expr("li.l_suppkey + 2 = s3.s_suppkey"), "left")
        .join(s.alias("s4"), F.expr("li.l_suppkey + 3 = s4.s_suppkey"), "left")
        .join(F.broadcast(n), F.expr("c1.c_nationkey = n.n_nationkey"), "left")
        .join(F.broadcast(r), F.expr("n.n_regionkey = r.r_regionkey"), "left")
    )
    return out.select(
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.col("c1.c_name").alias("c1_name"),
        F.col("c2.c_name").alias("c2_name"),
        F.col("c3.c_name").alias("c3_name"),
        F.col("c4.c_name").alias("c4_name"),
        F.col("li.l_suppkey").alias("l_suppkey"),
        F.col("s1.s_name").alias("s1_name"),
        F.col("s2.s_name").alias("s2_name"),
        F.col("s3.s_name").alias("s3_name"),
        F.col("s4.s_name").alias("s4_name"),
        F.col("n.n_name").alias("nation_name"),
        F.col("r.r_name").alias("region_name"),
    )


def _rows(df, cols=OUT_COLS):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_full_width_join_churn_and_replay(spark, sf_dir, tmp_path):
    # --- base entity tables (bounded subset: 60 orders + their lines) ---
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 240)
        .select("o_orderkey", "o_custkey")
        .withColumn("v", F.lit(1).cast("long"))
    )
    okeys = [r[0] for r in orders.select("o_orderkey").collect()]
    customer = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
        .withColumn("v", F.lit(1).cast("long"))
    )
    supplier = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name")
        .withColumn("v", F.lit(1).cast("long"))
    )
    lineitem = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isin(okeys))
        .select("l_orderkey", "l_suppkey", "l_linenumber", "l_shipdate")
        .withColumn("v", F.lit(1).cast("long"))
    )
    nation = (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .withColumn("v", F.lit(1).cast("long"))
    )
    region = (
        table(spark, sf_dir, "region")
        .select("r_regionkey", "r_name")
        .withColumn("v", F.lit(1).cast("long"))
    )

    # --- churn: a v=2 update for EVERY entity role of the join ---
    upd_orders = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_custkey", F.col("o_custkey") + 1)  # remaps c1..c4
        .withColumn("v", F.lit(2).cast("long"))
    )
    upd_customer = (
        customer.filter(F.col("c_custkey") % 11 == 0)
        .withColumn("c_name", F.concat(F.col("c_name"), F.lit("#u")))
        .withColumn("c_nationkey", (F.col("c_nationkey") + 1) % 25)  # remaps n, r
        .withColumn("v", F.lit(2).cast("long"))
    )
    upd_supplier = (
        supplier.filter(F.col("s_suppkey") % 3 == 0)
        .withColumn("s_name", F.concat(F.col("s_name"), F.lit("#u")))
        .withColumn("v", F.lit(2).cast("long"))
    )
    # a LATER child line for some orders, pointing at a different supplier
    upd_lineitem = (
        lineitem.filter(F.col("l_orderkey") % 5 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.max("l_shipdate").alias("l_shipdate"),
            F.first("l_suppkey").alias("l_suppkey"),
        )
        .select(
            "l_orderkey",
            ((F.col("l_suppkey") % 10) + 1).alias("l_suppkey"),  # remaps s1..s4
            F.lit(99).alias("l_linenumber"),
            (F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS")).alias("l_shipdate"),
            F.lit(2).alias("v"),
        )
    )
    # parquet stream schemas must match the base files exactly
    upd_lineitem = upd_lineitem.select(
        *[F.col(f.name).cast(f.dataType) for f in lineitem.schema.fields]
    )
    upd_nation = (
        nation.filter(F.col("n_nationkey") % 6 == 0)
        .withColumn("n_regionkey", (F.col("n_regionkey") + 1) % 5)  # remaps r
        .withColumn("v", F.lit(2).cast("long"))
    )
    upd_region = (
        region.filter(F.col("r_regionkey") % 2 == 0)
        .withColumn("r_name", F.concat(F.col("r_name"), F.lit("#u")))
        .withColumn("v", F.lit(2).cast("long"))
    )

    base = {
        "orders": (orders, ["o_orderkey"], "v", []),
        "customer": (customer, ["c_custkey"], "v", []),
        "supplier": (supplier, ["s_suppkey"], "v", []),
        # latest child per order by shipdate, deterministic tie-break
        "lineitem": (lineitem, ["l_orderkey"], "l_shipdate", ["l_linenumber"]),
        "nation": (nation, ["n_nationkey"], "v", []),
        "region": (region, ["r_regionkey"], "v", []),
    }
    updates = {
        "orders": upd_orders,
        "customer": upd_customer,
        "supplier": upd_supplier,
        "lineitem": upd_lineitem,
        "nation": upd_nation,
        "region": upd_region,
    }
    # churn lineitem rows must win the latest-per-order contest
    assert updates["lineitem"].count() > 0

    stages = {name: str(tmp_path / "stage" / name) for name in base}
    work = str(tmp_path / "work")

    def stream_defs():
        defs = []
        for name, (df, keys, order_col, ties) in base.items():
            s = (
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(stages[name], "f*"))
            )
            defs.append(StreamDef(name, s, keys, order_col, ties))
        return defs

    def stage_file(name, df, idx):
        os.makedirs(stages[name], exist_ok=True)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stages[name], f"f{idx:04d}")
        )

    # ---- run 1: base data only ----
    for name, (df, *_rest) in base.items():
        stage_file(name, df, 0)
    stores = run_snapshot_join_pipeline(spark, stream_defs(), _join11, work)
    log1 = [
        (tuple(r[c] for c in OUT_COLS), r["is_retract"])
        for r in spark.read.parquet(os.path.join(work, "result", "changelog")).collect()
    ]
    # first run: inserts only, and they ARE the run-1 result
    assert not any(is_r for _, is_r in log1)

    # ---- run 2: drip the churn files; same checkpoints resume ----
    for name, df in updates.items():
        stage_file(name, df, 1)
    stores = run_snapshot_join_pipeline(spark, stream_defs(), _join11, work)
    got = _rows(stores["result"].read(spark))

    # (1) snapshot == batch dedup+join over base ∪ updates
    latest = {}
    for name, (df, keys, order_col, ties) in base.items():
        latest[name] = dedup.latest_per_key(
            df.unionByName(updates[name]), keys, order_col, ties
        )
    want = _rows(_join11(latest))
    assert got == want

    # the churn genuinely changed the output
    assert got != _rows(_join11({k: v for k, (v, *_r) in base.items()}))

    # (2) changelog replay: run-1 inserts + run-2 inserts − run-2
    # retracts (multiset) == final snapshot
    log2 = [
        (tuple(r[c] for c in OUT_COLS), r["is_retract"])
        for r in spark.read.parquet(os.path.join(work, "result", "changelog")).collect()
    ]
    assert any(is_r for _, is_r in log2), "churn must produce retracts"
    replayed = collections.Counter(row for row, is_r in log1 if not is_r)
    for row, is_r in log2:
        if is_r:
            replayed[row] -= 1
            assert replayed[row] >= 0, f"retract of a row never inserted: {row}"
        else:
            replayed[row] += 1
    assert sorted(replayed.elements()) == want
