"""BMP codec: exact luma recovery pinned against an independent in-test
writer (struct-packed per the file-format spec, sharing nothing with the
decoder), across 24/32/8/1-bit profiles, bottom-up and top-down row
orders, and odd widths (row padding); rejection matrix for the untrusted
header; the three Spark lanes end to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.bmp import _bmp_decode


def _luma(r, g, b):
    return (77 * int(r) + 150 * int(g) + 29 * int(b)) >> 8


def _write_bmp(pixels_rgb: np.ndarray, bpp=24, top_down=False, palette=None):
    """Independent writer: pixels_rgb is (h, w, 3) uint8 for 24/32-bit;
    for 8/1-bit pass an index array (h, w) + palette [(r,g,b), ...]."""
    if bpp in (24, 32):
        h, w, _ = pixels_rgb.shape
    else:
        h, w = pixels_rgb.shape
    n_colors = len(palette) if palette else 0
    row_bits = w * bpp
    stride = ((row_bits + 31) // 32) * 4
    data_offset = 14 + 40 + 4 * n_colors
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        if bpp == 24:
            row = bytearray()
            for x in range(w):
                r, g, b = pixels_rgb[y, x]
                row += bytes([b, g, r])
        elif bpp == 32:
            row = bytearray()
            for x in range(w):
                r, g, b = pixels_rgb[y, x]
                row += bytes([b, g, r, 0])
        elif bpp == 8:
            row = bytearray(int(v) for v in pixels_rgb[y])
        else:  # 1-bit, MSB-first
            row = bytearray()
            acc, nb = 0, 0
            for x in range(w):
                acc = (acc << 1) | int(pixels_rgb[y, x])
                nb += 1
                if nb == 8:
                    row.append(acc)
                    acc, nb = 0, 0
            if nb:
                row.append(acc << (8 - nb))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pix = b"".join(rows)
    hdr = b"BM" + struct.pack(
        "<IHHI", data_offset + len(pix), 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, 0, len(pix), 2835, 2835,
        n_colors, 0,
    )
    pal = b""
    if palette:
        for r, g, b in palette:
            pal += bytes([b, g, r, 0])
    return hdr + info + pal + pix


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("bpp", [24, 32])
def test_truecolor_exact_luma(spark, bpp, top_down):
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)  # odd width
    payload = _write_bmp(px, bpp=bpp, top_down=top_down)
    w, h, gray = _bmp_decode(payload)
    assert (w, h) == (5, 7)
    for y in range(7):
        for x in range(5):
            assert gray[y, x] == _luma(*px[y, x]), (y, x)


def test_palette_8bit_and_1bit(spark):
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    w, h, gray = _bmp_decode(_write_bmp(idx, bpp=8, palette=pal))
    assert (w, h) == (3, 2)
    for y in range(2):
        for x in range(3):
            assert gray[y, x] == _luma(*pal[idx[y, x]])
    bits = np.array([[0, 1, 1, 0, 1], [1, 0, 0, 1, 0]], dtype=np.uint8)
    bw = [(0, 0, 0), (255, 255, 255)]
    w, h, gray = _bmp_decode(_write_bmp(bits, bpp=1, palette=bw))
    assert (w, h) == (5, 2)
    want = np.where(bits == 1, _luma(255, 255, 255), 0)
    assert np.array_equal(gray, want)


def test_rejection_matrix(spark):
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _write_bmp(px)
    with pytest.raises(ValueError, match="bad signature"):
        _bmp_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        _bmp_decode(good[:-3])
    # dimension bomb: huge header on a tiny payload fails BEFORE alloc
    bomb = bytearray(good)
    bomb[18:26] = struct.pack("<ii", 1 << 20, 1 << 20)
    with pytest.raises(ValueError, match="exceed|truncated"):
        _bmp_decode(bytes(bomb))
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(NotImplementedError, match="compression"):
        _bmp_decode(bytes(rle))
    b16 = bytearray(good)
    b16[28:30] = struct.pack("<H", 16)
    with pytest.raises(NotImplementedError, match="bit depth"):
        _bmp_decode(bytes(b16))


def test_spark_lanes_end_to_end(spark):
    """decode_media / extract_features / frame_sample / phash over real
    BMP bytes, with a corrupt payload quarantined not fatal."""
    from drill_logfile_plugin_spark.operators.multimodal import (
        decode_media,
        extract_features,
        frame_sample,
        phash_signatures,
    )

    rng = np.random.default_rng(9)
    rows = []
    for i in range(4):
        px = rng.integers(0, 256, size=(6 + i, 5, 3), dtype=np.uint8)
        rows.append((i, _write_bmp(px)))
    rows.append((99, b"BMgarbage-not-a-real-bitmap-payload-xx"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    meta = {r["doc_id"]: r for r in decode_media(df, codec="bmp").collect()}
    assert len(meta) == 5  # corrupt row quarantined, not dropped
    for i in range(4):
        assert (meta[i]["width"], meta[i]["height"]) == (5, 6 + i)
        assert meta[i]["media_format"] == "bmp"
    assert meta[99]["width"] is None

    feats = extract_features(df, codec="bmp", dim=8, on_error="skip").collect()
    assert len(feats) == 4
    for r in feats:
        assert abs(sum(r["features"]) - 1.0) < 1e-9

    frames = frame_sample(df, codec="bmp", on_error="skip").collect()
    assert len(frames) == 4  # one frame per still image
    assert all(r["frame_idx"] == 0 and r["t_ms"] == 0 for r in frames)

    sigs = phash_signatures(df, codec="bmp").collect()
    assert len(sigs) == 4


def test_phash_matches_same_pixels_across_containers(spark):
    """The content-level claim extends to BMP: the same pixels as a BMP
    and as a PNG produce IDENTICAL aHash signatures."""
    from drill_logfile_plugin_spark.operators.multimodal import (
        _ahash64_luma,
        _png_encode_gray,
    )
    from drill_logfile_plugin_spark.operators.multimodal import _png_decode

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    # grayscale pixels through the BMP truecolor path (r=g=b keeps luma)
    px = np.stack([gray, gray, gray], axis=2)
    bmp_luma = _bmp_decode(_write_bmp(px))[2]
    png_luma = _png_decode(_png_encode_gray(gray))[2]
    # BT.601 of (v,v,v) = (77+150+29)v >> 8 = v (exactly)
    assert np.array_equal(bmp_luma, gray)
    assert _ahash64_luma(bmp_luma) == _ahash64_luma(png_luma)
