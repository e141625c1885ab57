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
    bitfields = bytearray(good)
    bitfields[30:34] = struct.pack("<I", 3)
    with pytest.raises(NotImplementedError, match="compression"):
        _bmp_decode(bytes(bitfields))
    # RLE8 declared on a 24-bit image is malformed, not a plug-in point
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError, match="RLE8 requires 8"):
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


# --- RLE8 / RLE4 / 4-bit (r8) ---------------------------------------------------


def _bmp_container(pix: bytes, w: int, h: int, bpp: int, compression: int, palette):
    """Assemble a BMP around a prebuilt pixel stream (the RLE writers)."""
    n_colors = len(palette)
    data_offset = 14 + 40 + 4 * n_colors
    hdr = b"BM" + struct.pack("<IHHI", data_offset + len(pix), 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bpp, compression, len(pix), 2835, 2835, n_colors, 0,
    )
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    return hdr + info + pal + pix


def rle8_encode(idx: np.ndarray, absolute_rows=(), delta_skip=None) -> bytes:
    """Independent spec encoder: run-packs each row bottom-up, ends rows
    with (0,0) and the stream with (0,1). ``absolute_rows`` emit via
    absolute mode instead (word-aligned); ``delta_skip=(row, dx)``
    replaces that row's first dx pixels with a (0,2) cursor jump."""
    h, w = idx.shape
    out = bytearray()
    for file_row, y in enumerate(range(h - 1, -1, -1)):
        x = 0
        if delta_skip and delta_skip[0] == file_row:
            out += bytes([0, 2, delta_skip[1], 0])
            x = delta_skip[1]
        if file_row in absolute_rows and w - x >= 3:
            run = [int(v) for v in idx[y, x:]]
            out += bytes([0, len(run)]) + bytes(run)
            if len(run) & 1:
                out += b"\x00"  # word alignment pad
            x = w
        while x < w:
            v = int(idx[y, x])
            n = 1
            while x + n < w and int(idx[y, x + n]) == v and n < 255:
                n += 1
            out += bytes([n, v])
            x += n
        out += bytes([0, 0])  # end of line
    out += bytes([0, 1])  # end of bitmap
    return bytes(out)


def rle4_encode(idx: np.ndarray) -> bytes:
    """Independent RLE4 encoder: alternating-nibble encoded runs."""
    h, w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        x = 0
        while x < w:
            a = int(idx[y, x])
            b = int(idx[y, x + 1]) if x + 1 < w else a
            n = 0
            while x + n < w and int(idx[y, x + n]) == (a if n % 2 == 0 else b) and n < 255:
                n += 1
            out += bytes([n, (a << 4) | b])
            x += n
        out += bytes([0, 0])
    out += bytes([0, 1])
    return bytes(out)


def _gray_palette(n):
    return [(i * 255 // (n - 1),) * 3 for i in range(n)]


def test_rle8_exact_vs_uncompressed():
    rng = np.random.default_rng(11)
    # runs-heavy index image (RLE's natural content)
    idx = np.repeat(rng.integers(0, 16, size=(9, 4), dtype=np.uint8), 3, axis=1)[:, :11]
    palette = _gray_palette(16)
    plain = _bmp_decode(_write_bmp(idx, bpp=8, palette=palette))
    rle = _bmp_decode(
        _bmp_container(rle8_encode(idx), 11, 9, 8, 1, palette)
    )
    assert plain[0:2] == rle[0:2] == (11, 9)
    assert np.array_equal(plain[2], rle[2])


def test_rle8_absolute_and_delta_modes():
    rng = np.random.default_rng(12)
    idx = rng.integers(0, 8, size=(6, 10), dtype=np.uint8)
    palette = _gray_palette(8)
    # absolute mode on two rows decodes identically to encoded mode
    a = _bmp_decode(_bmp_container(rle8_encode(idx), 10, 6, 8, 1, palette))[2]
    b = _bmp_decode(
        _bmp_container(rle8_encode(idx, absolute_rows={1, 3}), 10, 6, 8, 1, palette)
    )[2]
    assert np.array_equal(a, b)
    # a delta jump leaves the skipped cells at index 0
    skipped = idx.copy()
    skipped[2, :4] = 0  # file row 3 counts from the bottom: image row h-1-3
    c = _bmp_decode(
        _bmp_container(rle8_encode(idx, delta_skip=(3, 4)), 10, 6, 8, 1, palette)
    )[2]
    ref = _bmp_decode(_write_bmp(skipped, bpp=8, palette=palette))[2]
    assert np.array_equal(c, ref)


def test_rle4_exact_vs_uncompressed_4bit():
    rng = np.random.default_rng(13)
    idx = np.repeat(rng.integers(0, 16, size=(5, 5), dtype=np.uint8), 2, axis=1)[:, :9]
    palette = _gray_palette(16)
    rle = _bmp_decode(_bmp_container(rle4_encode(idx), 9, 5, 4, 2, palette))
    # cross-check against the plain 8-bit path (same indexes, same palette)
    plain = _bmp_decode(_write_bmp(idx, bpp=8, palette=palette))
    assert np.array_equal(rle[2], plain[2])


def test_uncompressed_4bit_high_nibble_first():
    idx = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    palette = _gray_palette(16)
    h, w = idx.shape
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(0, w, 2):
            hi = int(idx[y, x])
            lo = int(idx[y, x + 1]) if x + 1 < w else 0
            row.append((hi << 4) | lo)
        row += b"\x00" * (4 - len(row) % 4 if len(row) % 4 else 0)
        rows.append(bytes(row))
    payload = _bmp_container(b"".join(rows), w, h, 4, 0, palette)
    got = _bmp_decode(payload)
    ref = _bmp_decode(_write_bmp(idx, bpp=8, palette=palette))
    assert np.array_equal(got[2], ref[2])


def test_rle_rejections():
    palette = _gray_palette(8)
    idx = np.zeros((4, 4), dtype=np.uint8)
    ok = rle8_encode(idx)
    # missing end-of-bitmap
    with pytest.raises(ValueError, match="truncated"):
        _bmp_decode(_bmp_container(ok[:-2], 4, 4, 8, 1, palette))
    # run overflows the row
    overflow = bytes([6, 1, 0, 1])  # 6 pixels into a 4-wide row
    with pytest.raises(ValueError, match="outside the bitmap"):
        _bmp_decode(_bmp_container(overflow, 4, 4, 8, 1, palette))
    # delta jumps beyond the bitmap
    jump = bytes([0, 2, 200, 200, 0, 1])
    with pytest.raises(ValueError, match="jumps outside"):
        _bmp_decode(_bmp_container(jump, 4, 4, 8, 1, palette))
    # RLE8 must be 8-bit; RLE4 must be 4-bit; RLE must be bottom-up
    with pytest.raises(ValueError, match="RLE8 requires 8"):
        _bmp_decode(_bmp_container(ok, 4, 4, 4, 1, palette))
    with pytest.raises(ValueError, match="RLE4 requires 4"):
        _bmp_decode(_bmp_container(ok, 4, 4, 8, 2, palette))
    with pytest.raises(ValueError, match="bottom-up"):
        _bmp_decode(_bmp_container(ok, 4, -4, 8, 1, palette))
    # palette index beyond the table
    big = bytes([1, 7, 0, 0, 0, 1])
    with pytest.raises(ValueError, match="palette index"):
        _bmp_decode(_bmp_container(big, 4, 4, 8, 1, _gray_palette(4)))


def test_os2_core_header_and_packed_palette():
    """BITMAPCOREHEADER: 12-byte header, 16-bit dims, BGR palette
    triples — decodes identically to the same indexes under a V3
    header."""
    rng = np.random.default_rng(14)
    idx = rng.integers(0, 16, size=(5, 6), dtype=np.uint8)
    # a core-header 8-bit palette is ALWAYS 256 entries (no biClrUsed)
    palette = _gray_palette(16) + [(0, 0, 0)] * 240
    # independent core-header writer
    stride = ((6 * 8 + 31) // 32) * 4
    rows = []
    for y in range(4, -1, -1):
        row = bytearray(int(v) for v in idx[y]) + b"\x00" * (stride - 6)
        rows.append(bytes(row))
    pix = b"".join(rows)
    pal = b"".join(bytes([b, g, r]) for r, g, b in palette)
    data_offset = 14 + 12 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", data_offset + len(pix), 0, 0, data_offset)
    core = struct.pack("<IhhHH", 12, 6, 5, 1, 8)
    payload = hdr + core + pal + pix
    got = _bmp_decode(payload)
    ref = _bmp_decode(_write_bmp(idx, bpp=8, palette=palette))
    assert got[0:2] == (6, 5)
    assert np.array_equal(got[2], ref[2])
