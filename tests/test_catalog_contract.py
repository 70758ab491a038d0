"""Schema contract for every catalog table.

Guards against test-data format drift: round 3's final commit left
``events.ts`` as TIMESTAMP_NTZ when the driver regenerated the parquet
with native TIMESTAMP(MICROS), and every ``unix_micros`` caller died at
analysis time (22/85 queries). These are schema-only asserts — no Spark
job runs — so the whole module is sub-second after session startup.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    MapType,
    StringType,
    TimestampType,
)

from fink_joiner_spark import catalog

# Minimal per-table column contract: (column, type) pairs every operator
# in the repo relies on. Extra columns in the data are allowed.
REQUIRED = {
    "region": {"r_regionkey": None, "r_name": StringType},
    "nation": {"n_nationkey": None, "n_name": StringType, "n_regionkey": None},
    "customer": {"c_custkey": None, "c_name": StringType, "c_nationkey": None},
    "supplier": {"s_suppkey": None, "s_name": StringType, "s_nationkey": None},
    "part": {"p_partkey": None, "p_name": StringType},
    "orders": {"o_orderkey": None, "o_custkey": None},
    "lineitem": {"l_orderkey": None, "l_partkey": None, "l_suppkey": None},
    "events": {
        "event_id": LongType,
        "ts": TimestampType,  # MUST be TZ-aware TIMESTAMP, never NTZ/long
        "user_id": LongType,
        "event_type": StringType,
        "value": DoubleType,
        "props": None,
    },
    "documents": {"doc_id": None, "text": StringType},
    "embeddings": {"vec_id": LongType, "embedding": ArrayType},
}


@pytest.mark.parametrize("name", catalog.TABLES)
def test_table_schema_contract(spark, sf_dir, name):
    df = catalog.table(spark, sf_dir, name)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, expected in REQUIRED[name].items():
        assert col in fields, f"{name}.{col} missing; has {sorted(fields)}"
        if expected is not None:
            assert isinstance(fields[col], expected), (
                f"{name}.{col} is {fields[col]}, expected {expected.__name__}"
            )


def test_events_ts_is_tz_aware_timestamp(spark, sf_dir):
    """The exact r3 regression: ts must resolve under unix_micros()."""
    ev = catalog.table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    # Analysis-time check only (no job): unix_micros must resolve.
    ev.selectExpr("unix_micros(ts) AS ts_us").schema


def test_embeddings_vector_element_type(spark, sf_dir):
    emb = catalog.table(spark, sf_dir, "embeddings")
    el = emb.schema["embedding"].dataType.elementType
    assert isinstance(el, (FloatType, DoubleType)), el


def test_documents_optional_binary_payload(spark, sf_dir):
    """Multimodal ops read payload/media columns when present; if the
    generator ships one, it must be binary (opaque bytes) + string mime."""
    doc = catalog.table(spark, sf_dir, "documents")
    fields = {f.name: f.dataType for f in doc.schema.fields}
    for cand in ("payload", "media", "blob"):
        if cand in fields:
            assert isinstance(fields[cand], BinaryType), fields[cand]
    if "props" in fields:
        assert isinstance(fields["props"], (MapType, StringType))
