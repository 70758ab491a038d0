"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column that stays untouched by Catalyst (no accidental
decode in a shuffle); metadata (byte length, content hash, sniffed
format) is cheap JVM-side columns; decoding runs in ``mapInPandas``
over Arrow record batches so each Python worker touches one partition-
sized stream of bytes, never the driver.

The actual codec step is STUBBED (no image/audio libs in this
container): :func:`decode_stub` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector — the Spark-side plumbing (schema, batching, partitioning) is
real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def binarize(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Model a multimodal record: opaque bytes + typed metadata columns.

    (Here the bytes come from utf-8 text since the test corpus is text;
    with real images this is the raw file/blob column.)
    """
    payload = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha256"),
        F.substring(F.col(payload_col), 1, 4).alias("magic"),
    )


FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_stub(payload: bytes, fake: bool, normalize: bool = True) -> list[float]:
    """The codec boundary. Real deployments plug PIL/ffmpeg/torchaudio
    here; this container has none, so only the deterministic fake path
    is available (byte-histogram moments — stable across runs).

    ``normalize=False`` returns the raw integer bucket counts — exact
    values with no float rounding, the right form for hash-compared
    correctness oracles."""
    if not fake:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake=True "
            "for the deterministic stand-in feature extractor"
        )
    n = max(1, len(payload))
    buckets = [0] * FEATURE_DIM
    for byte in payload:
        buckets[byte % FEATURE_DIM] += 1
    if not normalize:
        return [float(b) for b in buckets]
    return [round(b / n, 6) for b in buckets]


def extract_features(df: DataFrame, fake: bool = True, normalize: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the existing partitioning (no shuffle); each
    batch is a pandas DataFrame whose ``payload`` column holds raw
    bytes. Output schema is fixed and typed — downstream operators
    (ANN search, dedup) consume ``features`` like any embedding column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(
                        lambda b: decode_stub(bytes(b), fake, normalize)
                    ),
                }
            )

    return df.mapInPandas(run, _FEATURE_SCHEMA)
