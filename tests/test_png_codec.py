"""Real-codec contract for the multimodal tier: the built-in PNG decoder
(operators/multimodal.py `_png_decode` + the codec="png" lanes).

The test encodes PNGs with its OWN spec-following encoder (struct + zlib,
forward filtering per the PNG spec, per-row filter types chosen to cover
all five) — an independent reference implementation — and asserts the
package's decoder recovers the exact pixels, across color types. Then the
Spark-side lanes (decode_media / extract_features / frame_sample) are
driven end-to-end over a payload DataFrame.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import multimodal as M

# --- independent reference encoder -----------------------------------------

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def test_adam7_pass_table_matches_spec_figure():
    """The encoder's pass table must reproduce the literal 8x8 pass-
    assignment figure from PNG spec 8.2 — guards against the encoder and
    decoder agreeing on a wrong-but-self-consistent geometry."""
    spec_figure = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ]
    )
    got = np.zeros((8, 8), dtype=int)
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
        got[y0::dy, x0::dx] = p
    assert np.array_equal(got, spec_figure)
    # and the package decoder uses the identical table
    assert tuple(M._ADAM7) == _ADAM7


def _filter_subimage(bytes_px: np.ndarray, bpp: int, filters) -> bytearray:
    """Forward-filter one (sub-)image given as (h, stride) BYTE rows."""
    h, stride = bytes_px.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    flat = bytes_px.astype(np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        row = flat[y]
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(row[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            out[x] = (int(row[x]) - pred) & 0xFF
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = row
    return raw


def _to_bytes_rows(px: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, nch) samples -> (h, ceil(w*nch*depth/8)) big-endian byte
    rows; sub-byte samples pack MSB-first per the spec."""
    h, w, nch = px.shape
    if depth == 8:
        return px.astype(np.uint8).reshape(h, w * nch)
    if depth == 16:
        return px.astype(">u2").view(np.uint8).reshape(h, w * nch * 2)
    bits = (
        (px.reshape(h, w * nch, 1).astype(np.uint8)
         >> np.arange(depth - 1, -1, -1))
        & 1
    ).reshape(h, w * nch * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def encode_png(
    px: np.ndarray,
    color_type: int,
    filters: list[int],
    palette=None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Forward-filter + deflate ``px`` (h, w, channels; uint8 for depth 8,
    uint16 for depth 16) into a PNG, row y of each (sub-)image filtered
    with ``filters[y % len(filters)]``; Adam7 when ``interlace=1``."""
    h, w, nch = px.shape
    assert nch == _CHANNELS[color_type]
    bpp = max(1, nch * depth // 8)  # filter unit floors at one byte (9.2)
    raw = bytearray()
    if interlace == 0:
        raw += _filter_subimage(_to_bytes_rows(px, depth), bpp, filters)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _filter_subimage(
                    _to_bytes_rows(sub, depth), bpp, filters
                )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    body = _chunk(b"IHDR", ihdr)
    if color_type == 3:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    body += _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _rng(seed):
    return np.random.default_rng(seed)


ALL_FILTERS = [0, 1, 2, 3, 4]


def test_png_decode_gray_all_filters():
    px = _rng(1).integers(0, 256, size=(13, 7, 1), dtype=np.uint8)
    w, h, gray = M._png_decode(encode_png(px, 0, ALL_FILTERS))
    assert (w, h) == (7, 13)
    assert np.array_equal(gray, px[:, :, 0])


def test_png_decode_rgb_luma():
    px = _rng(2).integers(0, 256, size=(9, 17, 3), dtype=np.uint8)
    w, h, gray = M._png_decode(encode_png(px, 2, ALL_FILTERS))
    assert (w, h) == (17, 9)
    rgb = px.astype(np.int64)
    expect = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    assert np.array_equal(gray, expect.astype(np.uint8))


def test_png_decode_rgba_ignores_alpha():
    px = _rng(3).integers(0, 256, size=(5, 5, 4), dtype=np.uint8)
    _, _, gray = M._png_decode(encode_png(px, 6, ALL_FILTERS))
    rgb = px[:, :, :3].astype(np.int64)
    expect = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    assert np.array_equal(gray, expect.astype(np.uint8))


def test_png_decode_gray_alpha_first_channel():
    px = _rng(6).integers(0, 256, size=(4, 6, 2), dtype=np.uint8)
    _, _, gray = M._png_decode(encode_png(px, 4, ALL_FILTERS))
    assert np.array_equal(gray, px[:, :, 0])


def test_png_decode_palette():
    pal = _rng(4).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(5).integers(0, 16, size=(6, 8, 1), dtype=np.uint8)
    _, _, gray = M._png_decode(encode_png(idx, 3, [0, 2], palette=pal))
    rgb = pal[idx[:, :, 0]].astype(np.int64)
    expect = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    assert np.array_equal(gray, expect.astype(np.uint8))


def test_png_bad_signature_and_invalid_profile():
    with pytest.raises(ValueError, match="signature"):
        M._png_decode(b"JFIF....not a png")
    px = _rng(7).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    good = encode_png(px, 2, [0])
    # flip the IHDR depth byte to 4: RGB at depth 4 is SPEC-INVALID
    # (11.2.2) — a header lie, so ValueError, not a missing feature
    ihdr_at = good.index(b"IHDR") + 4
    bad_depth = bytearray(good)
    bad_depth[ihdr_at + 8] = 4
    with pytest.raises(ValueError, match="spec-valid"):
        M._png_decode(bytes(bad_depth))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_decode_subbyte_gray_exact_scaling(depth):
    """Sub-byte grayscale: MSB-first unpacking across byte boundaries
    (width chosen so rows end mid-byte) and the exact 255/(2^d-1)
    sample scaling, under all five filters."""
    hh, ww = 9, 11  # 11 px at depth 1/2/4 -> 2/3/6 bytes: mid-byte ends
    px = _rng(50 + depth).integers(
        0, 1 << depth, size=(hh, ww, 1), dtype=np.uint8
    )
    w, h, gray = M._png_decode(encode_png(px, 0, ALL_FILTERS, depth=depth))
    assert (w, h) == (ww, hh)
    factor = 255 // ((1 << depth) - 1)
    assert np.array_equal(gray, (px[:, :, 0] * factor).astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_decode_subbyte_palette_and_adam7(depth):
    pal = _rng(60).integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
    idx = _rng(61 + depth).integers(
        0, 1 << depth, size=(10, 13, 1), dtype=np.uint8
    )
    for interlace in (0, 1):
        _, _, gray = M._png_decode(
            encode_png(
                idx, 3, ALL_FILTERS, palette=pal, depth=depth,
                interlace=interlace,
            )
        )
        rgb = pal[idx[:, :, 0]].astype(np.int64)
        expect = (
            rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114
        ) // 1000
        assert np.array_equal(gray, expect.astype(np.uint8)), interlace


def test_png_palette_index_out_of_range_is_value_error():
    pal = _rng(70).integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = np.full((3, 3, 1), 5, dtype=np.uint8)  # index 5 >= 4 entries
    with pytest.raises(ValueError, match="PLTE range"):
        M._png_decode(encode_png(idx, 3, [0], palette=pal, depth=8))


def test_png_decode_16bit_high_byte_luma():
    """16-bit samples reduce to their high byte (the spec's fast-path
    16->8 scaling) before the BT.601 luma math — pinned across gray and
    RGB, all five filters (filter unit = 2 and 6 bytes)."""
    g16 = _rng(20).integers(0, 1 << 16, size=(11, 6, 1), dtype=np.uint16)
    w, h, gray = M._png_decode(encode_png(g16, 0, ALL_FILTERS, depth=16))
    assert (w, h) == (6, 11)
    assert np.array_equal(gray, (g16[:, :, 0] >> 8).astype(np.uint8))
    c16 = _rng(21).integers(0, 1 << 16, size=(7, 9, 3), dtype=np.uint16)
    _, _, gray = M._png_decode(encode_png(c16, 2, ALL_FILTERS, depth=16))
    rgb = (c16 >> 8).astype(np.int64)
    expect = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    assert np.array_equal(gray, expect.astype(np.uint8))


@pytest.mark.parametrize("size", [(1, 1), (3, 2), (8, 8), (13, 21), (17, 5)])
def test_png_decode_adam7_exact(size):
    """Adam7 de-interlacing recovers the exact pixels at awkward sizes
    (passes that are empty, single-pixel, or partial all occur here)."""
    hh, ww = size
    px = _rng(30 + hh).integers(0, 256, size=(hh, ww, 1), dtype=np.uint8)
    w, h, gray = M._png_decode(
        encode_png(px, 0, ALL_FILTERS, interlace=1)
    )
    assert (w, h) == (ww, hh)
    assert np.array_equal(gray, px[:, :, 0])


def test_png_decode_adam7_rgb_16bit():
    px = _rng(40).integers(0, 1 << 16, size=(10, 12, 3), dtype=np.uint16)
    _, _, gray = M._png_decode(
        encode_png(px, 2, ALL_FILTERS, depth=16, interlace=1)
    )
    rgb = (px >> 8).astype(np.int64)
    expect = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    assert np.array_equal(gray, expect.astype(np.uint8))


def test_png_bomb_guards():
    """IHDR dimensions are untrusted: implausible sizes and over-long
    inflate streams raise ValueError before any large allocation."""
    px = _rng(41).integers(0, 256, size=(3, 3, 1), dtype=np.uint8)
    good = encode_png(px, 0, [0])
    ihdr_at = good.index(b"IHDR") + 4
    huge = bytearray(good)
    huge[ihdr_at : ihdr_at + 8] = struct.pack(">II", 1 << 16, 1 << 16)
    with pytest.raises(ValueError, match="bound"):
        M._png_decode(bytes(huge))
    zero = bytearray(good)
    zero[ihdr_at : ihdr_at + 8] = struct.pack(">II", 0, 3)
    with pytest.raises(ValueError, match="zero"):
        M._png_decode(bytes(zero))
    # a stream that inflates to MORE than the header promises: the
    # bounded decompressobj stops at expected+1 and rejects
    raw_rows = bytes([0]) + px[0, :, 0].tobytes()
    bloated = zlib.compress(raw_rows * 64)
    body = good[8 : good.index(b"IDAT") - 4]
    fat = (
        b"\x89PNG\r\n\x1a\n" + body
        + _chunk(b"IDAT", bloated) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="does not match"):
        M._png_decode(fat)


def test_unknown_codec_still_rejected(spark):
    df = spark.range(1).select(
        F.col("id").alias("doc_id"), F.lit(b"x").alias("payload")
    )
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        M.decode_media(df, codec="ffmpeg")


@pytest.fixture(scope="module")
def png_frame(spark):
    rows = []
    for i, (hh, ww, ct) in enumerate(
        [(13, 7, 0), (9, 17, 2), (5, 5, 6), (24, 3, 2)]
    ):
        px = _rng(100 + i).integers(
            0, 256, size=(hh, ww, _CHANNELS[ct]), dtype=np.uint8
        )
        rows.append((i, ww, hh, bytearray(encode_png(px, ct, ALL_FILTERS))))
    return spark.createDataFrame(
        rows, "doc_id long, true_w int, true_h int, payload binary"
    )


def test_decode_media_png_end_to_end(spark, png_frame):
    out = {
        r["doc_id"]: r
        for r in M.decode_media(png_frame, codec="png").collect()
    }
    truth = {r["doc_id"]: r for r in png_frame.collect()}
    assert set(out) == set(truth)
    for i, t in truth.items():
        r = out[i]
        assert r["media_format"] == "png"
        assert (r["width"], r["height"]) == (t["true_w"], t["true_h"])
        assert r["n_pixels"] == t["true_w"] * t["true_h"]
        assert r["n_bytes"] == len(t["payload"])


def test_extract_features_png_is_pixel_histogram(spark, png_frame):
    dim = 16
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(png_frame, dim=dim, codec="png").collect()
    }
    for t in png_frame.collect():
        _, _, gray = M._png_decode(bytes(t["payload"]))
        hist = np.bincount(
            (gray.ravel().astype(np.int64) * dim) // 256, minlength=dim
        ) / gray.size
        got = np.asarray(feats[t["doc_id"]])
        assert got.shape == (dim,)
        assert abs(got.sum() - 1.0) < 1e-9
        assert np.allclose(got, hist)


def test_frame_sample_png_single_frame(spark, png_frame):
    rows = M.frame_sample(png_frame, codec="png").collect()
    assert len(rows) == png_frame.count()
    assert all(r["frame_idx"] == 0 and r["t_ms"] == 0 for r in rows)


def test_resize_plan_accepts_png(spark, png_frame):
    meta = M.decode_media(png_frame, codec="png")
    planned = M.resize_plan(meta, max_side=8, codec="png").collect()
    for r in planned:
        assert max(r["target_width"], r["target_height"]) <= 8
        assert min(r["target_width"], r["target_height"]) >= 1


def test_png_corrupt_idat_is_value_error():
    """Malformed bytes raise ValueError uniformly — a truncated/garbled
    IDAT must not leak zlib.error out of the decoder."""
    px = _rng(8).integers(0, 256, size=(4, 4, 1), dtype=np.uint8)
    good = encode_png(px, 0, [0])
    idat_at = good.index(b"IDAT")
    bad = good[: idat_at + 4] + bytes(16) + good[idat_at + 20 :]
    with pytest.raises(ValueError, match="PNG"):
        M._png_decode(bad)


# --- actual resize (decode -> resample -> re-encode) ------------------------


def test_resize_media_real_bytes_roundtrip(spark, png_frame):
    """resize_media produces REAL grayscale-PNG bytes: decoding them
    recovers exactly the nearest-neighbor resample of the source luma,
    and the aspect/cap arithmetic matches resize_plan's."""
    out = {
        r["doc_id"]: r
        for r in M.resize_media(png_frame, max_side=8, codec="png").collect()
    }
    for t in png_frame.collect():
        w, h, gray = M._png_decode(bytes(t["payload"]))
        r = out[t["doc_id"]]
        assert max(r["width"], r["height"]) <= 8
        ww, hh, got = M._png_decode(bytes(r["payload"]))
        assert (ww, hh) == (r["width"], r["height"])
        rows = (np.arange(hh, dtype=np.int64) * h) // hh
        cols = (np.arange(ww, dtype=np.int64) * w) // ww
        assert np.array_equal(got, gray[np.ix_(rows, cols)])


def test_resize_media_small_image_reencoded_unscaled(spark):
    px = _rng(80).integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(px, 0, ALL_FILTERS)))],
        "doc_id long, payload binary",
    )
    r = M.resize_media(df, max_side=16, codec="png").collect()[0]
    assert (r["width"], r["height"]) == (4, 5)
    _, _, got = M._png_decode(bytes(r["payload"]))
    assert np.array_equal(got, px[:, :, 0])


def test_resize_media_jpeg_input_and_quarantine(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_jpeg_codec import _gray_jpeg

    payload, _ = _gray_jpeg(90, 32, 48)
    df = spark.createDataFrame(
        [(0, bytearray(payload)), (1, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    rows = M.resize_media(df, max_side=16, codec="jpeg").collect()
    assert {r["doc_id"] for r in rows} == {0}  # corrupt row skipped
    r = rows[0]
    assert (r["width"], r["height"]) == (16, 10)  # 48x32 capped, aspect kept
    ww, hh, _ = M._png_decode(bytes(r["payload"]))
    assert (ww, hh) == (16, 10)
    with pytest.raises(Exception, match="SOI|JPEG"):
        M.resize_media(df, max_side=16, codec="jpeg", on_error="strict").collect()
