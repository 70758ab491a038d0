"""Bounded sources (SURVEY.md §2.1 S4): in-memory fixtures.

The reference's ``env.fromCollection(listingData)`` static streams
(``FlinkJoiner.scala:279-313``) become ``spark.createDataFrame``. The
canonical tiny fixture (FIXTURES.md §5) is reproduced here verbatim —
re-versioned keys + a late-looking update — because it exercises dedup,
as-of and late-data semantics in a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("data", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),  # minute-granularity epoch ms
    ]
)

# FlinkJoiner.scala:279-297 static data; ts = minute * 60000 ms.
LISTINGS_FIXTURE = [
    (1, "listing 1.0", 1 * 60000),
    (2, "listing 2.0", 1 * 60000),
    (3, "listing 3.0", 1 * 60000),
    (4, "listing 4.0", 1 * 60000),
    (2, "listing 2.1", 3 * 60000),
    (1, "listing 1.1", 4 * 60000),
    (2, "listing 2.1", 10 * 60000),
]
IMAGES_FIXTURE = [
    (1, "Image 1.0", 1 * 60000),
    (1, "Image 1.1", 2 * 60000),
    (1, "Image 1.2", 3 * 60000),
    (2, "Image 2.0", 3 * 60000),
]
OPEN_HOUSES_FIXTURE = [
    (1, "OH 1.0", 1 * 60000),
    (1, "OH 1.1", 2 * 60000),
    (2, "OH 2.0", 2 * 60000),
]


def memory_source(spark: SparkSession, rows, schema=_FIXTURE_SCHEMA) -> DataFrame:
    """S4 — bounded in-memory source (``env.fromCollection``).

    Built as a pure-JVM literal plan (``explode`` of an array of
    literal structs over ``spark.range(1)``) rather than
    ``spark.createDataFrame``: the row-list path parallelizes PICKLED
    rows into an RDD, so every execution of the query ships the rows
    through a Python worker (r13 bench: ``s4_memory_fixture_pipeline``
    spent ~2 s/rep on three 3-7-row sources). Literal structs live in
    the plan itself — no driver-side row materialization at execution,
    no Python boundary (guide §4/§5). Output rows/schema are identical
    (pinned by tests + the s4 oracle)."""
    if not rows:
        return spark.createDataFrame(rows, schema)
    fields = list(schema.fields)
    structs = [
        F.struct(
            *[
                F.lit(row[i]).cast(f.dataType).alias(f.name)
                for i, f in enumerate(fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )


def read_files(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Generic bounded file source: parquet / json-lines / csv / orc /
    avro / text with an explicitly pinned schema.

    The schema-pinning stance mirrors the reference's arc: it tried
    schema-on-read inference (``deriveSchema()``,
    ``FlinkJoiner_backup.txt:592-623``) and abandoned it for hand-pinned
    ``RowTypeInfo`` schemas. Same conclusion at 100 TB for a different
    reason — inference over json/csv is a FULL extra pass over the
    data; infer once on a sample (:func:`infer_and_pin`), then pin.
    """
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def infer_and_pin(
    spark: SparkSession, path: str, format: str, sample_files: int = 1, **options: str
) -> T.StructType:
    """Infer a schema from a bounded sample of a dataset's files, to be
    pinned in code / a schema registry thereafter. The sample bounds the
    inference cost no matter how large the dataset is."""
    import glob as _glob
    import os as _os

    candidates = sorted(_glob.glob(_os.path.join(path, "*"))) or [path]
    files = [p for p in candidates if not _os.path.basename(p).startswith(("_", "."))]
    reader = spark.read.format(format)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(files[:sample_files]).schema


def fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "listings": memory_source(spark, LISTINGS_FIXTURE),
        "images": memory_source(spark, IMAGES_FIXTURE),
        "open_houses": memory_source(spark, OPEN_HOUSES_FIXTURE),
    }
