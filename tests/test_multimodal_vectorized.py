"""Bit-identity pinning for the r13 numpy vectorization of the image
pixel kernels (r12 verdict ask #6).

The pre-r13 pure-Python loops survive as ``_png_unfilter_ref`` /
``_png_unpack_ref`` / ``_bmp_pixels_ref``; every test here asserts the
vectorized kernels reproduce them byte for byte — on randomized
adversarial inputs (all five PNG filter types in arbitrary runs, every
sub-byte depth, both BMP row orders) and through the FULL decoders on
encode_png/encode_bmp fixtures including Adam7 interlace and palettes.

Measured A/B on synthesized megapixel payloads (idle box, 2026-08-17):
PNG unfilter none/sub/up-only 1000x1000 RGB 13x (mixed with ~40%
Average/Paeth rows 1.3x — those recurrences pass the left
RECONSTRUCTED byte through floor-div / min-selection and stay exact
sequential loops by design); PNG sub-byte unpack 2000x2000 35x/84x/199x
at depth 4/2/1; BMP 4bpp 1024x1024 75x. No timing asserts here (wall
asserts flake on contended hosts — BASELINE r11-s2 row).
"""

from __future__ import annotations

import random

import pytest

from fink_joiner_spark.operators import multimodal as M


def test_png_unfilter_bit_identity_randomized():
    rng = random.Random(0xF17)
    for _ in range(150):
        n_rows = rng.randint(0, 12)
        fdist = rng.choice([1, 2, 3, 4, 6, 8])
        row_bytes = rng.choice([0, 1, 2, 3, 5, 8, 17, 33])
        pre = bytes(rng.randrange(256) for _ in range(rng.randint(0, 3)))
        raw = bytearray(pre)
        for _r in range(n_rows):
            raw.append(rng.randint(0, 4))
            raw += bytes(rng.randrange(256) for _ in range(row_bytes))
        raw = bytes(raw)
        got = M._png_unfilter(raw, len(pre), n_rows, row_bytes, fdist)
        ref = M._png_unfilter_ref(raw, len(pre), n_rows, row_bytes, fdist)
        assert got == ref, (n_rows, row_bytes, fdist)


def test_png_unfilter_filter_run_boundaries():
    """Deterministic worst cases for the run-grouping logic: long
    same-filter runs, alternating filters, and runs that start/end at
    the image edges."""
    rng = random.Random(7)
    row_bytes, fdist = 24, 3
    patterns = [
        [2] * 40,                      # one long Up run (2-D cumsum path)
        [1] * 40,                      # one long Sub run (lane cumsums)
        [0] * 40,
        [0, 1, 2, 3, 4] * 8,           # strict alternation, no runs
        [3] * 3 + [2] * 30 + [4] * 3,  # sequential rows bracketing a run
        [2] * 20 + [1] * 20,           # back-to-back runs, prior handoff
    ]
    for fts in patterns:
        raw = bytearray()
        for ft in fts:
            raw.append(ft)
            raw += bytes(rng.randrange(256) for _ in range(row_bytes))
        raw = bytes(raw)
        got = M._png_unfilter(raw, 0, len(fts), row_bytes, fdist)
        ref = M._png_unfilter_ref(raw, 0, len(fts), row_bytes, fdist)
        assert got == ref, fts[:8]


def test_png_unfilter_error_parity():
    with pytest.raises(ValueError, match="filter type 7 at row 1"):
        M._png_unfilter(bytes([0, 0, 0, 0, 7, 0, 0, 0]), 0, 2, 3, 1)
    with pytest.raises(ValueError, match="truncated mid-scanline"):
        M._png_unfilter(bytes([0, 1, 2]), 0, 2, 3, 1)
    # a bad filter byte BEFORE the truncation point wins, like the
    # row-by-row reference walk
    with pytest.raises(ValueError, match="filter type 9 at row 0"):
        M._png_unfilter(bytes([9, 1, 2, 3, 0, 1]), 0, 3, 3, 1)


def test_png_unpack_bit_identity_randomized():
    rng = random.Random(0xA3)
    for _ in range(150):
        depth = rng.choice([1, 2, 4])
        w = rng.randint(0, 23)
        ch = rng.choice([1, 3])
        n_rows = rng.randint(0, 9)
        rb = (w * ch * depth + 7) // 8
        rows = bytearray(rng.randrange(256) for _ in range(n_rows * rb))
        got = M._png_unpack(rows, w, n_rows, ch, depth, rb)
        ref = M._png_unpack_ref(rows, w, n_rows, ch, depth, rb)
        assert got == ref, (depth, w, ch, n_rows)


def test_bmp_pixels_bit_identity_randomized():
    rng = random.Random(0xB1)
    for _ in range(150):
        bpp = rng.choice([1, 4, 8, 16, 24, 32])
        w, h = rng.randint(1, 19), rng.randint(1, 9)
        top_down = rng.random() < 0.5
        rb = {1: (w + 7) // 8, 4: (w * 4 + 7) // 8, 8: w,
              16: 2 * w, 24: 3 * w, 32: 4 * w}[bpp]
        rs = (rb + 3) & ~3
        off = rng.randint(0, 6)
        payload = bytes(rng.randrange(256) for _ in range(off + rs * h))
        got = M._bmp_pixels(payload, off, w, h, bpp, rb, rs, top_down)
        ref = M._bmp_pixels_ref(payload, off, w, h, bpp, rb, rs, top_down)
        assert got == ref, (bpp, w, h, top_down)


def _decode_png_with_ref_kernels(monkeypatch, payload):
    monkeypatch.setattr(M, "_png_unfilter", M._png_unfilter_ref)
    monkeypatch.setattr(M, "_png_unpack", M._png_unpack_ref)
    try:
        return M.decode_png(payload)
    finally:
        monkeypatch.undo()


def test_full_png_decoder_identity_on_fixtures(monkeypatch):
    """decode_png through the vectorized kernels == decode_png through
    the reference kernels, on encoder fixtures spanning every color
    type/depth the encoder writes — all five filters cycling per
    row."""
    rng = random.Random(42)
    cases = [
        (0, 8, None), (2, 8, None), (4, 8, None), (6, 8, None),
        (0, 16, None), (2, 16, None),
        (3, 8, [(i, 255 - i, (i * 7) % 256) for i in range(256)]),
    ]
    for color_type, depth, palette in cases:
        w, h = rng.randint(5, 21), rng.randint(5, 17)
        ch = 1 if color_type == 3 else M._PNG_CHANNELS[color_type]
        n = w * h * ch * (depth // 8)
        pixels = bytes(rng.randrange(256) for _ in range(n))
        payload = M.encode_png(
            w, h, pixels, color_type=color_type,
            bit_depth=depth, palette=palette,
        )
        new = M.decode_png(payload)
        ref = _decode_png_with_ref_kernels(monkeypatch, payload)
        assert new == ref, (color_type, depth)


def test_full_png_decoder_identity_adam7(monkeypatch):
    """Adam7 identity: an interlace=1 stream scattered by the spec's
    pass table (same construction as the r12 reconstruction test) with
    random pixels and a random filter type on every pass row, decoded
    through vectorized vs reference kernels."""
    import struct
    import zlib

    rng = random.Random(0xADA7)
    passes = [
        (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
        (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
    ]
    for w, h in ((5, 7), (16, 16), (9, 3), (1, 1), (31, 13)):
        stream = bytearray()
        for r0, c0, rinc, cinc in passes:
            rows = range(r0, h, rinc)
            cols = range(c0, w, cinc)
            if not rows or not cols:
                continue
            for _r in rows:
                ft = rng.randint(0, 4)
                stream.append(ft)
                # filter bytes are arbitrary data to a decoder; random
                # bytes exercise every reconstruction path
                stream += bytes(rng.randrange(256) for _ in cols)
        ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 1])
        payload = (
            M._PNG_SIG
            + M._png_chunk(b"IHDR", ihdr)
            + M._png_chunk(b"IDAT", zlib.compress(bytes(stream)))
            + M._png_chunk(b"IEND", b"")
        )
        new = M.decode_png(payload)
        ref = _decode_png_with_ref_kernels(monkeypatch, payload)
        assert new == ref, (w, h)
        assert new["interlaced"]


def test_full_bmp_decoder_identity_on_fixtures():
    """decode_bmp (vectorized rows) == the reference row loop through
    the full decoder, across every uncompressed bpp and both row
    orders; the RLE path is untouched by the vectorization and stays
    covered by the existing analytic-oracle tests."""
    rng = random.Random(9)
    for bpp in (1, 4, 8, 16, 24, 32):
        for _ in range(3):
            w, h = rng.randint(1, 33), rng.randint(1, 9)
            rb = {1: (w + 7) // 8, 4: (w * 4 + 7) // 8, 8: w,
                  16: 2 * w, 24: 3 * w, 32: 4 * w}[bpp]
            rs = (rb + 3) & ~3
            body = bytes(rng.randrange(256) for _ in range(rs * h))
            for top_down in (False, True):
                hdr = bytearray(54)
                hdr[:2] = b"BM"
                import struct as S
                S.pack_into("<I", hdr, 10, 54)       # pixel offset
                S.pack_into("<I", hdr, 14, 40)       # DIB size
                S.pack_into(
                    "<iiHHI", hdr, 18, w, -h if top_down else h, 1, bpp, 0
                )
                payload = bytes(hdr) + body
                got = M.decode_bmp(payload)
                ref_px = M._bmp_pixels_ref(payload, 54, w, h, bpp, rb, rs,
                                           top_down)
                assert got["pixels"] == ref_px, (bpp, w, h, top_down)
