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


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, every_n: int = 2, fake: bool = True
) -> DataFrame:
    """Frame sampling over binary payloads — the video-ingest step:
    treat the payload as consecutive ``frame_size``-byte frames and
    keep every ``every_n``-th one.

    The mapInPandas stage FANS OUT (one input row → many frame rows)
    while keeping the existing partitioning — the batch-shape change a
    real video pipeline needs (decode happens per frame downstream,
    never per file on one worker). The frame decode itself is the
    stubbed codec boundary; the deterministic stand-in emits exact
    integer byte checksums so oracles can hash-compare.
    """
    if not fake:
        raise NotImplementedError(
            "video codecs unavailable in this environment; pass fake=True "
            "for the deterministic frame-checksum stand-in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = -(-len(b) // frame_size) if b else 0
                for f in range(0, n_frames, every_n):
                    chunk = b[f * frame_size : (f + 1) * frame_size]
                    ids.append(rid)
                    idxs.append(f)
                    sizes.append(len(chunk))
                    sums.append(sum(chunk))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(run, _FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("out_checksum", T.LongType()),
        T.StructField("head_byte", T.LongType()),
        T.StructField("tail_byte", T.LongType()),
    ]
)


def resize_payload(
    df: DataFrame, target_bytes: int = 32, fake: bool = True
) -> DataFrame:
    """Nearest-neighbor byte resampling — the resize step's plumbing:
    out[i] = payload[floor(i·n/target)], the 1-D analog of
    nearest-neighbor image resize, as an Arrow-batched mapInPandas
    stage (no shuffle, partitioning preserved). A real deployment
    swaps the sampler for PIL/ffmpeg scaling at the same boundary;
    the deterministic stand-in emits exact integer summaries of the
    resampled bytes for oracle comparison.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic byte-resampling stand-in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    rows.append((rid, 0, 0, 0, -1, -1))
                    continue
                out = bytes(b[(i * n) // target_bytes] for i in range(target_bytes))
                rows.append((rid, n, len(out), sum(out), out[0], out[-1]))
            yield pd.DataFrame(
                rows,
                columns=["id", "n_in", "n_out", "out_checksum", "head_byte", "tail_byte"],
            ).astype("int64")

    return df.mapInPandas(run, _RESIZE_SCHEMA)


def perceptual_hash(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload 8-bit perceptual hash from the (stubbed) decoded
    features: bit i is set when byte-bucket i holds MORE than its
    uniform share (8·f_i > n_bytes — integer-exact, no float mean).
    With a real codec the features are DCT coefficients and this is
    classic pHash; the thresholding + pairing machinery is identical.
    Emits (id, n_bytes, phash)."""
    feats = extract_features(df, fake=fake, normalize=False)
    phash = None
    # uniform share threshold: bucket_i > n_bytes / FEATURE_DIM,
    # kept integral as FEATURE_DIM * f_i > n_bytes — derived from the
    # dim so widening the hash keeps the bits unbiased
    for i in range(FEATURE_DIM):
        bit = F.when(
            F.col("features")[i] * FEATURE_DIM > F.col("n_bytes"), F.lit(1 << i)
        ).otherwise(F.lit(0))
        phash = bit if phash is None else phash + bit
    return feats.select("id", "n_bytes", phash.cast("long").alias("phash"))


def phash_dup_pairs(df: DataFrame, fake: bool = True, max_hamming: int = 1) -> DataFrame:
    """Perceptual near-dup pairs: payloads whose 8-bit perceptual
    hashes differ in at most ``max_hamming`` bits (default 1).

    Pigeonhole blocking, the simhash trick: hamming ≤ 1 over 8 bits
    means the two 4-bit HALVES can't both differ, so candidates come
    from an equi-join on (half-index, half-value) — never all-pairs —
    and the exact hamming check (bit_count of xor) runs only inside
    blocks. Emits (id_a, id_b, hamming) with id_a < id_b.

    CAVEAT — hash entropy is the scale knob: pigeonhole blocking only
    bounds candidates when hashes spread. A corpus whose payloads share
    one byte-profile (e.g. same-language text through the stub decoder)
    collapses into a handful of mega-blocks and the pair set approaches
    all-pairs — measured 3.5M pairs over 5 000 synthetic docs. With a
    real DCT-based pHash (or any decoder whose features discriminate),
    the 2^8 hash space spreads and the blocks stay bounded; for low-
    entropy regimes widen the hash before pairing.

    Two halves guarantee completeness ONLY for ``max_hamming <= 1``
    (k+1 blocks are needed for hamming k — hamming-2 pairs can differ
    once in EACH half and never share a block), so larger values are
    rejected instead of silently under-returning.
    """
    if max_hamming > 1:
        raise ValueError(
            "two-half pigeonhole blocking is complete only for "
            f"max_hamming <= 1 (got {max_hamming}); split into "
            "max_hamming + 1 blocks to go wider"
        )
    if FEATURE_DIM % 2:
        raise ValueError("FEATURE_DIM must be even for the half split")
    half_mod = 1 << (FEATURE_DIM // 2)
    h = perceptual_hash(df, fake=fake).select(
        "id", "phash",
        (F.col("phash") % half_mod).alias("lo"),
        (F.col("phash") / half_mod).cast("long").alias("hi"),
    )
    blocks = h.select(
        "id", "phash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("half"), F.col("lo").alias("val")),
                F.struct(F.lit(1).alias("half"), F.col("hi").alias("val")),
            )
        ).alias("b"),
    ).select("id", "phash", F.col("b.half").alias("half"), F.col("b.val").alias("val"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.half") == F.col("b.half"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)
