"""Projection / row-transform operators (SURVEY.md §2.2).

The reference's bulk of code is per-topic "mapper" functions doing
imperative Jackson JSON extraction (``CRMLSJoiner.scala:118-155`` and 5
siblings). Here the same work is declarative — ``from_json`` /
``get_json_object`` column expressions that Catalyst can prune and
push down, executed inside whole-stage codegen with zero Python cost.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# The CRMLS change-log envelope (CRMLSJoiner.scala:97-116, FIXTURES.md §1):
# 9 fields shared by all six production topics. Strings + epoch longs only,
# matching the reference's type discipline.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.StringType()),
        T.StructField("uc_pk", T.StringType()),
        T.StructField("uc_update_ts", T.StringType()),
        T.StructField("uc_version", T.StringType()),
        T.StructField("uc_created_ts", T.LongType()),
        T.StructField("uc_row_type", T.StringType()),
        T.StructField("uc_type", T.StringType()),
        T.StructField("uc_valid_day", T.LongType()),
        T.StructField("uc_valid_ts", T.LongType()),
    ]
)


def parse_envelope(
    df: DataFrame,
    json_col: str = "value",
    payload_keys: Mapping[str, str] | None = None,
    prefix: str = "",
) -> DataFrame:
    """P1 — JSON envelope projection.

    Parses the 9-field change-log envelope from a raw JSON string column
    and pulls per-topic join keys out of the nested ``data`` payload
    (null-guarded like the reference's mappers: missing envelope strings
    → ``""``, missing payload keys → NULL; ``CRMLSJoiner.scala:122-139``).

    ``payload_keys`` maps output column name → JSONPath inside ``data``
    (e.g. ``{"l_listing_key": "$.ListingKeyNumeric"}``).
    """
    env = F.from_json(F.col(json_col), ENVELOPE_SCHEMA).alias("e")
    out = df.select(env).select(
        F.coalesce(F.col("e.data"), F.lit("")).alias(f"{prefix}data"),
        F.coalesce(F.col("e.uc_pk"), F.lit("")).alias(f"{prefix}uc_pk"),
        F.coalesce(F.col("e.uc_update_ts"), F.lit("")).alias(f"{prefix}uc_update_ts"),
        F.coalesce(F.col("e.uc_version"), F.lit("")).alias(f"{prefix}uc_version"),
        F.coalesce(F.col("e.uc_created_ts"), F.lit(0)).alias(f"{prefix}uc_created_ts"),
        F.coalesce(F.col("e.uc_row_type"), F.lit("")).alias(f"{prefix}uc_row_type"),
        F.coalesce(F.col("e.uc_type"), F.lit("")).alias(f"{prefix}uc_type"),
        F.coalesce(F.col("e.uc_valid_day"), F.lit(0)).alias(f"{prefix}uc_valid_day"),
        F.coalesce(F.col("e.uc_valid_ts"), F.lit(0)).alias(f"{prefix}uc_valid_ts"),
    )
    for name, path in (payload_keys or {}).items():
        out = out.withColumn(name, F.get_json_object(F.col(f"{prefix}data"), path))
    return out


def extract_nested_array(df: DataFrame, json_col: str, path: str, alias: str) -> Column | DataFrame:
    """P2 — nested-array JSON extraction.

    The reference indexes into a JSON array inside the payload
    (``rawPayload.get("ActiveAgent:Agent").get(0).get("Agent ID")``,
    ``FlinkJoiner.scala:186-190``). Spark form: a bracket-notation
    JSONPath, e.g. ``$['ActiveAgent:Agent'][0]['Agent ID']``.
    """
    return df.withColumn(alias, F.get_json_object(F.col(json_col), path))


def flatmap_tokens(df: DataFrame, text_col: str, out_col: str = "word") -> DataFrame:
    """P4 — flatMap tokenize (``WordCount.scala:44``):
    ``explode(split(...))``, dropping empty tokens."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias(out_col))
        .filter(F.col(out_col) != "")
    )


def rename_columns(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """P7 — positional column renaming at registration
    (``tEnv.fromDataStream(stream, 'l_data, 'l_uc_pk, …)``)."""
    return df.toDF(*names)
