"""Property test (SURVEY.md §5.2 item 4): for ANY arrival order of a
versioned stream, the final dedup snapshot — and therefore the joined
result — is invariant. This is the correctness core of the whole
incremental-snapshot architecture."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st

from fink_joiner_spark.operators import dedup
from fink_joiner_spark.streaming.dedup_stream import SnapshotStore

# (key, version_ts, payload-id) events; duplicate (key, ts) allowed —
# tie-break must stay deterministic via the payload id.
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=1_000),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events, seed=st.integers(min_value=0, max_value=2**16))
def test_snapshot_invariant_under_arrival_order(spark, tmp_path_factory, rows, seed):
    schema = "k long, ts long, pid long"
    want_df = dedup.latest_per_key(
        spark.createDataFrame(rows, schema), ["k"], "ts", tie_breakers=["pid"]
    )
    want = sorted(tuple(r) for r in want_df.collect())

    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    store = SnapshotStore(
        str(tmp_path_factory.mktemp("snap")), ["k"], "ts", ["pid"]
    )
    # feed in arbitrary arrival order, arbitrary batch boundaries
    rng = random.Random(seed + 1)
    i = 0
    while i < len(shuffled):
        j = i + rng.randint(1, 5)
        store.upsert(spark.createDataFrame(shuffled[i:j], schema))
        i = j
    got = sorted(tuple(r) for r in store.read(spark).collect())
    assert got == want


# Batch sessionization: for ANY event set and arrival order, session
# stats equal a sequential reference implementation (sort per key, walk
# once, split on gap > threshold).
_sess_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=10_000), # seconds offset
        st.integers(min_value=0, max_value=10_000), # event id (tie-break)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: (t[0], t[2]),
)


def _sessions_reference(rows, gap_s=1800):
    by_user = {}
    for u, sec, eid in rows:
        by_user.setdefault(u, []).append((sec, eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        idx, start, last = 0, None, None
        for sec, _ in evs:
            if last is None or sec - last > gap_s:
                idx += 1
                out[(u, idx)] = [sec, sec]  # [start, end]
            else:
                out[(u, idx)][1] = sec
            last = sec
    return {
        k: (v[0] * 1_000_000, (v[1] - v[0]) * 1_000_000) for k, v in out.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_sess_events, seed=st.integers(min_value=0, max_value=2**16))
def test_sessionize_matches_sequential_reference(spark, rows, seed):
    import datetime

    from pyspark.sql import functions as F

    from fink_joiner_spark.operators import sessions

    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    base = datetime.datetime(2024, 1, 1)
    data = [
        (u, base + datetime.timedelta(seconds=sec), eid) for u, sec, eid in shuffled
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, event_id long")
    got = {
        (r.user_id, r.session_idx): (
            r.session_start_us - 1704067200000000,  # epoch us of base
            r.duration_us,
        )
        for r in sessions.session_stats(
            df, ["user_id"], "ts", gap="30 minutes", tie_breakers=["event_id"]
        ).collect()
    }
    want = _sessions_reference(rows)
    assert got == want


# z-set incremental join: for ANY base/delta z-sets, applying the
# bilinear delta to the stored view equals a full recompute of
# (A+dA) ⋈ (B+dB) — the DBSP law the engine's view maintenance rests on.
_zrows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # join key
        st.integers(min_value=0, max_value=2),   # payload
        st.sampled_from([-1, 1]),                # multiplicity
    ),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=_zrows, da=_zrows, b=_zrows, db=_zrows)
def test_delta_join_bilinear_law(spark, a, da, b, db):
    from collections import Counter

    from pyspark.sql import functions as F

    from fink_joiner_spark.operators import incremental

    sch_a, sch_b = "k long, pa long, mult long", "k long, pb long, mult long"
    A = incremental.z_normalize(spark.createDataFrame(a, sch_a)) if a else spark.createDataFrame([], sch_a)
    B = incremental.z_normalize(spark.createDataFrame(b, sch_b)) if b else spark.createDataFrame([], sch_b)
    dA = spark.createDataFrame(da, sch_a) if da else spark.createDataFrame([], sch_a)
    dB = spark.createDataFrame(db, sch_b) if db else spark.createDataFrame([], sch_b)

    v_old = (
        A.withColumnRenamed("mult", "_ml")
        .join(B.withColumnRenamed("mult", "_mr"), "k")
        .withColumn("mult", F.col("_ml") * F.col("_mr"))
        .drop("_ml", "_mr")
    )
    dv = incremental.delta_join(A, dA, B, dB, on="k")
    got = {
        (r["k"], r["pa"], r["pb"]): r["mult"]
        for r in incremental.z_normalize(v_old.unionByName(dv)).collect()
    }

    # sequential reference: materialize both new z-sets, join with
    # multiplicity products, drop zeros
    def zset(rows):
        c = Counter()
        for k, p, m in rows:
            c[(k, p)] += m
        return {kp: m for kp, m in c.items() if m != 0}

    an, bn = zset(a + da), zset(b + db)
    want = Counter()
    for (k1, pa), m1 in an.items():
        for (k2, pb), m2 in bn.items():
            if k1 == k2:
                want[(k1, pa, pb)] += m1 * m2
    want = {kp: m for kp, m in want.items() if m != 0}
    assert got == want


# Boilerplate scrub: with an unreachable document-frequency threshold
# nothing is scrubbed and every document round-trips to its normalized
# (lowercased, whitespace-collapsed) text.
_docs_txt = st.lists(
    st.text(alphabet="ab c\tA", min_size=0, max_size=40),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs_txt)
def test_scrub_roundtrip_when_threshold_unreachable(spark, texts):
    from fink_joiner_spark.operators import text as text_ops

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_scrubbed"], r["clean_text"])
        for r in text_ops.scrub_boilerplate(df, "doc_id", "text", 3, 10**6).collect()
    }
    for i, t in enumerate(texts):
        want = " ".join(t.lower().split())
        if i in out:
            assert out[i] == (0, want)
        else:
            # docs yielding zero segments (no tokens) produce no row
            assert want == ""


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1, max_size=25,
    ),
    st.integers(0, 1000),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_relabel_invariance(spark, edges, offset):
    """PageRank is label-blind: shifting every node id by a constant
    shifts the output keys and nothing else (exact integer ranks)."""
    from fink_joiner_spark.operators import graph

    e = [(a, b) for a, b in edges if a != b]
    if not e:
        return
    base = spark.createDataFrame(e, "src int, dst int")
    shifted = spark.createDataFrame(
        [(a + offset, b + offset) for a, b in e], "src int, dst int"
    )
    r0 = {r.node: r.rank_micro for r in graph.pagerank_bounded(base, iters=2).collect()}
    r1 = {r.node: r.rank_micro for r in graph.pagerank_bounded(shifted, iters=2).collect()}
    assert r1 == {k + offset: v for k, v in r0.items()}


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 10_000), st.integers(1, 500)),
        min_size=2, max_size=30, unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(-10**6, 10**6),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_twap_time_shift_invariance(spark, rows, shift):
    """TWAP weights are duration RATIOS: translating every timestamp
    by a constant must leave every group's TWAP unchanged."""
    from pyspark.sql import Window, functions as F

    def twap(data):
        df = spark.createDataFrame(data, "k int, ts_us long, cents long")
        w = Window.partitionBy("k").orderBy("ts_us")
        g = df.select(
            "k", "cents", (F.lead("ts_us").over(w) - F.col("ts_us")).alias("d")
        ).where(F.col("d").isNotNull() & (F.col("d") > 0))
        return {
            r.k: r.t
            for r in g.groupBy("k")
            .agg(F.round(F.sum(F.col("cents") * F.col("d")) / F.sum("d"), 6).alias("t"))
            .collect()
        }

    base = [(k, ts, c) for k, ts, c in rows]
    moved = [(k, ts + shift, c) for k, ts, c in rows]
    assert twap(base) == twap(moved)


# ---------------------------------------------------------------------------
# Codec roundtrip properties (pure python — no Spark session)
# ---------------------------------------------------------------------------

_wav_cases = st.tuples(
    st.integers(1, 192_000),                      # sample rate
    st.integers(1, 8),                            # channels
    st.sampled_from([8, 16, 24, 32]),             # bits
    st.integers(0, 37),                           # frame count
    st.lists(                                     # unknown chunks (odd+even)
        st.tuples(
            st.sampled_from([b"LIST", b"cue ", b"note", b"junk"]),
            st.binary(min_size=0, max_size=9),
        ),
        max_size=3,
    ),
    st.randoms(use_true_random=False),
)


@given(case=_wav_cases)
@settings(max_examples=60, deadline=None)
def test_wav_codec_roundtrip_property(case):
    """∀ (rate, channels, bits, frames, unknown chunks): decode ∘ encode
    is the identity on every fmt field and the full interleaved sample
    sequence, and unknown chunks (any id, odd OR even size, anywhere
    before data) never perturb the decode — the RIFF chunk walk and the
    spec's word-alignment pad byte hold for arbitrary layouts, not just
    the fixtures."""
    import struct

    from fink_joiner_spark.operators import multimodal

    rate, ch, bits, nf, extra, rnd = case
    n = nf * ch
    if bits == 8:
        samples = [rnd.randrange(256) for _ in range(n)]
        frames = bytes(samples)
    else:
        lo = -(1 << (bits - 1))
        samples = [rnd.randrange(lo, -lo) for _ in range(n)]
        frames = b"".join(
            v.to_bytes(bits // 8, "little", signed=True) for v in samples
        )
    enc = multimodal.encode_wav(rate, ch, bits, frames, extra_chunks=tuple(extra))
    # RIFF size field must cover the whole file per spec
    (riff_size,) = struct.unpack_from("<I", enc, 4)
    assert riff_size + 8 == len(enc)
    assert len(enc) % 2 == 0  # every chunk word-aligned
    m = multimodal.decode_wav(enc)
    assert (m["sample_rate"], m["channels"], m["bits"]) == (rate, ch, bits)
    assert m["n_frames"] == nf
    assert m["samples"] == samples


@given(
    w=st.integers(0, 23),
    h=st.integers(0, 9),
    bpp=st.sampled_from([8, 24]),
    top_down=st.booleans(),
    rnd=st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_bmp_codec_roundtrip_property(w, h, bpp, top_down, rnd):
    """∀ (width, height, depth, row order): decode ∘ encode returns the
    expected channel bytes in logical top-down order — encode_bmp takes
    one GRAY byte per pixel at both depths (24 bpp expands to BGR
    triplets, the writer's documented contract), and the row-padding /
    bottom-up-storage arithmetic must hold for every size, incl.
    degenerate zero-size images and widths at every pad remainder."""
    import struct

    from fink_joiner_spark.operators import multimodal

    px = bytes(rnd.randrange(256) for _ in range(w * h))
    enc = bytearray(multimodal.encode_bmp(w, h, px, bpp=bpp))
    logical = px if bpp == 8 else b"".join(bytes((v, v, v)) for v in px)
    want = logical
    if top_down and h > 1:
        struct.pack_into("<i", enc, 22, -h)
        row = w if bpp == 8 else 3 * w
        rows = [logical[i * row:(i + 1) * row] for i in range(h)]
        want = b"".join(reversed(rows))
    m = multimodal.decode_bmp(bytes(enc))
    assert (m["width"], m["height"], m["bpp"], m["n_pixels"]) == (w, h, bpp, w * h)
    assert m["pixels"] == want


# ---------------------------------------------------------------------------
# Avro OCF + snappy codec properties (round 12)
# ---------------------------------------------------------------------------

_OCF_PROP_SCHEMA = (
    '{"type": "record", "name": "p", "fields": ['
    '{"name": "k", "type": "long"}, {"name": "s", "type": "string"}, '
    '{"name": "f", "type": "boolean"}]}'
)


@given(data=st.binary(min_size=0, max_size=2000))
@settings(max_examples=80, deadline=None)
def test_snappy_literal_roundtrip_property(data):
    """∀ payload: decompress ∘ compress is the identity (the all-literal
    writer must stay inside the spec for every length, incl. the 1- and
    2-byte extended literal-length encodings)."""
    from fink_joiner_spark.sources import avro_wire as aw

    assert aw.snappy_decompress(aw.snappy_compress(data)) == data


@given(rnd=st.randoms(use_true_random=False), n_elems=st.integers(1, 12))
@settings(max_examples=80, deadline=None)
def test_snappy_copy_elements_property(rnd, n_elems):
    """∀ random valid element sequences (literals + 1/2/4-byte-offset
    copies, overlapping ones included): the decoder reproduces the
    reference reconstruction byte for byte."""
    from fink_joiner_spark.sources import avro_wire as aw

    out = bytearray()
    stream = bytearray()
    for _ in range(n_elems):
        if not out or rnd.random() < 0.5:
            lit = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 80)))
            n = len(lit)
            if n <= 60:
                stream.append((n - 1) << 2)
            else:
                stream.append(60 << 2)
                stream += (n - 1).to_bytes(1, "little")
            stream += lit
            out += lit
        else:
            off = rnd.randrange(1, len(out) + 1)
            kind = rnd.choice([1, 2, 4])
            if kind == 1:
                ln = rnd.randrange(4, 12)
                if off > 2047:
                    kind = 2
            if kind == 2:
                ln = rnd.randrange(1, 65)
                if off > 65535:
                    kind = 4
            if kind == 4:
                ln = rnd.randrange(1, 65)
            if kind == 1:
                stream.append(((off >> 8) << 5) | ((ln - 4) << 2) | 1)
                stream += bytes([off & 0xFF])
            elif kind == 2:
                stream.append(((ln - 1) << 2) | 2)
                stream += off.to_bytes(2, "little")
            else:
                stream.append(((ln - 1) << 2) | 3)
                stream += off.to_bytes(4, "little")
            start = len(out) - off
            for i in range(ln):  # overlapping-copy reference semantics
                out.append(out[start + i])
    from fink_joiner_spark.sources.avro_wire import _snappy_uvarint

    assert aw.snappy_decompress(_snappy_uvarint(len(out)) + bytes(stream)) == bytes(out)


_ocf_rows_strategy = st.lists(
    st.tuples(
        st.integers(-(2**62), 2**62),
        st.text(max_size=12),
        st.booleans(),
    ),
    min_size=0,
    max_size=40,
)


@given(
    rows=_ocf_rows_strategy,
    codec=st.sampled_from(["null", "deflate", "snappy", "bzip2", "xz"]),
    per_block=st.integers(1, 7),
)
@settings(max_examples=60, deadline=None)
def test_ocf_codec_roundtrip_property(rows, codec, per_block):
    """∀ (rows, codec, block size): decode ∘ encode is the identity and
    the block count follows the framing arithmetic."""
    from fink_joiner_spark.sources import avro_wire as aw

    recs = [{"k": k, "s": s, "f": f} for k, s, f in rows]
    doc = aw.decode_ocf(
        aw.encode_ocf(_OCF_PROP_SCHEMA, recs, codec=codec,
                      records_per_block=per_block)
    )
    assert doc["rows"] == recs
    assert doc["codec"] == codec
    assert doc["n_blocks"] == -(-len(recs) // per_block)


@given(
    rows=_ocf_rows_strategy,
    codec=st.sampled_from(["null", "deflate", "snappy", "bzip2", "xz"]),
    per_block=st.integers(1, 5),
    target=st.integers(32, 4000),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ocf_split_tiling_property(tmp_path_factory, rows, codec, per_block, target):
    """∀ (rows, codec, block size, split granularity): the byte-range
    readers together produce every record EXACTLY once — split
    boundaries may land inside block headers, block data, or sync
    markers; ownership must still tile. Drives plan_ocf_splits +
    _decode_ocf_range directly (pyarrow local FS, no Spark session)."""
    from pyarrow import fs as pafs

    from fink_joiner_spark.sources import avro_wire as aw

    recs = [{"k": k, "s": s, "f": f} for k, s, f in rows]
    d = tmp_path_factory.mktemp("ocfsplit")
    p = d / "x.avro"
    p.write_bytes(
        aw.encode_ocf(_OCF_PROP_SCHEMA, recs, codec=codec,
                      records_per_block=per_block)
    )
    splits = aw.plan_ocf_splits(str(p), _OCF_PROP_SCHEMA, target_split_bytes=target)
    fields = aw.parse_schema(_OCF_PROP_SCHEMA)
    filesystem = pafs.LocalFileSystem()
    got = []
    for s in splits:
        got.extend(
            aw._decode_ocf_range(
                filesystem, s["path"], s["start"], s["end"],
                s["header_end"], s["codec"], s["sync"], fields,
                chunk=97,  # tiny chunk: exercise the buffered scan paths
            )
        )
    assert got == recs  # splits are ordered, blocks within splits too


def test_ocf_split_final_sync_straddles_chunk_eof(tmp_path):
    """Deterministic regression (r13): a sync marker whose discovery
    needs the file's final PARTIAL chunk was never searched — the old
    scan loop returned as soon as ensure() hit EOF, before looking at
    the bytes that read DID append, and the last block's records were
    silently dropped (record loss, not an error). Params found by
    brute force against the pre-fix reader: each combination below
    loses >=1 record under the old loop and must tile exactly now."""
    from pyarrow import fs as pafs

    from fink_joiner_spark.sources import avro_wire as aw

    fields = aw.parse_schema(_OCF_PROP_SCHEMA)
    filesystem = pafs.LocalFileSystem()
    for case_i, (n, per_block, target, chunk) in enumerate(
        [(4, 1, 64, 31), (10, 3, 98, 50), (10, 4, 64, 50)]
    ):
        recs = [
            {"k": i * 7, "s": ("s%02d" % i) * 2, "f": bool(i % 2)}
            for i in range(n)
        ]
        p = tmp_path / f"straddle{case_i}.avro"
        p.write_bytes(
            aw.encode_ocf(_OCF_PROP_SCHEMA, recs, codec="null",
                          records_per_block=per_block)
        )
        splits = aw.plan_ocf_splits(
            str(p), _OCF_PROP_SCHEMA, target_split_bytes=target
        )
        got = []
        for s in splits:
            got.extend(
                aw._decode_ocf_range(
                    filesystem, s["path"], s["start"], s["end"],
                    s["header_end"], s["codec"], s["sync"], fields,
                    chunk=chunk,
                )
            )
        assert got == recs, f"case {case_i}: {len(got)}/{len(recs)} records"
