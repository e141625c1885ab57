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


def encode_png(
    px: np.ndarray, color_type: int, filters: list[int], palette=None
) -> bytes:
    """Forward-filter + deflate ``px`` (h, w, channels uint8) into a PNG,
    row y filtered with ``filters[y % len(filters)]``."""
    h, w, nch = px.shape
    assert nch == _CHANNELS[color_type]
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        row = flat[y]
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(row[x - nch]) if x >= nch else 0
            b = int(prev[x])
            c = int(prev[x - nch]) if x >= nch else 0
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
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
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


def test_png_bad_signature_and_unsupported_profile():
    with pytest.raises(ValueError, match="signature"):
        M._png_decode(b"JFIF....not a png")
    px = _rng(7).integers(0, 256, size=(3, 3, 1), dtype=np.uint8)
    good = encode_png(px, 0, [0])
    # flip the IHDR depth byte to 16: spec-valid PNG, unsupported profile
    ihdr_at = good.index(b"IHDR") + 4
    bad_depth = bytearray(good)
    bad_depth[ihdr_at + 8] = 16
    with pytest.raises(NotImplementedError, match="depth=16"):
        M._png_decode(bytes(bad_depth))


def test_unknown_codec_still_rejected(spark):
    df = spark.range(1).select(
        F.col("id").alias("doc_id"), F.lit(b"x").alias("payload")
    )
    with pytest.raises(NotImplementedError, match="jpeg"):
        M.decode_media(df, codec="jpeg")


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
