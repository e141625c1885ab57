"""TIFF codec: exact luma recovery against an independent in-test writer
(IFD chains packed per the TIFF 6.0 spec, both byte orders, multi-strip,
gray/min-is-white/RGB), multi-page first-page convention, the rejection
matrix, and the Spark lanes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators.tiff import (
    _tiff_decode,
    _tiff_pages,
)


def _luma(r, g, b):
    return (77 * int(r) + 150 * int(g) + 29 * int(b)) >> 8


def _write_tiff(
    pages, endian="<", rows_per_strip=None, photometric=None
):
    """Independent spec-following writer. ``pages`` is a list of either
    (h, w) gray arrays or (h, w, 3) RGB arrays; each page gets its own
    IFD; strips split at ``rows_per_strip`` (default: whole image)."""
    bom = b"II" if endian == "<" else b"MM"
    out = bytearray(bom + struct.pack(endian + "HI", 42, 0))
    ifd_offsets = []
    for img in pages:
        rgb = img.ndim == 3
        h, w = img.shape[:2]
        spp = 3 if rgb else 1
        rps = rows_per_strip or h
        strips = []
        for y0 in range(0, h, rps):
            strips.append(img[y0 : y0 + rps].tobytes())
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
        photo = photometric if photometric is not None else (2 if rgb else 1)

        def entry(tag, typ, vals):
            count = len(vals)
            fmt = {3: "H", 4: "I"}[typ]
            size = struct.calcsize(fmt) * count
            packed = struct.pack(endian + fmt * count, *vals)
            if size <= 4:
                return struct.pack(
                    endian + "HHI", tag, typ, count
                ) + packed.ljust(4, b"\x00"), b""
            off_pos = len(out) + 0  # resolved by caller via extras
            return None, (tag, typ, vals)

        # build entries; long values go to an extras block after the IFD
        tags = [
            (256, 3, [w]),
            (257, 3, [h]),
            (258, 3, [8] * spp),
            (259, 3, [1]),
            (262, 3, [photo]),
            (273, 4, strip_offsets),
            (277, 3, [spp]),
            (278, 3, [rps]),
            (279, 4, [len(s) for s in strips]),
        ]
        ifd_off = len(out)
        ifd_offsets.append(ifd_off)
        n = len(tags)
        extras = bytearray()
        extras_base = ifd_off + 2 + 12 * n + 4
        body = bytearray(struct.pack(endian + "H", n))
        for tag, typ, vals in tags:
            fmt = {3: "H", 4: "I"}[typ]
            packed = struct.pack(endian + fmt * len(vals), *vals)
            if len(packed) <= 4:
                body += struct.pack(endian + "HHI", tag, typ, len(vals))
                body += packed.ljust(4, b"\x00")
            else:
                body += struct.pack(
                    endian + "HHII",
                    tag,
                    typ,
                    len(vals),
                    extras_base + len(extras),
                )
                extras += packed
        body += struct.pack(endian + "I", 0)  # next-IFD placeholder
        out += body + extras
    # chain the IFDs and point the header at the first
    struct.pack_into(endian + "I", out, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        n = struct.unpack_from(endian + "H", out, ifd_offsets[i])[0]
        struct.pack_into(
            endian + "I", out, ifd_offsets[i] + 2 + 12 * n, ifd_offsets[i + 1]
        )
    return bytes(out)


@pytest.mark.parametrize("endian", ["<", ">"])
def test_gray_exact_both_endians(spark, endian):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    w, h, luma = _tiff_decode(_write_tiff([img], endian=endian))
    assert (w, h) == (7, 9)
    assert np.array_equal(luma, img)


def test_rgb_multistrip_and_min_is_white(spark):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    w, h, luma = _tiff_decode(_write_tiff([img], rows_per_strip=3))
    assert (w, h) == (6, 10)
    for y in range(10):
        for x in range(6):
            assert luma[y, x] == _luma(*img[y, x])
    gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    _, _, inv = _tiff_decode(_write_tiff([gray], photometric=0))
    assert np.array_equal(inv, 255 - gray)


def test_multipage_first_page_and_count(spark):
    a = np.full((3, 3), 10, dtype=np.uint8)
    b = np.full((5, 2), 20, dtype=np.uint8)
    blob = _write_tiff([a, b])
    w, h, luma = _tiff_decode(blob)
    assert (w, h) == (3, 3) and luma[0, 0] == 10  # FIRST page
    assert _tiff_pages(blob) == 2


def test_rejection_matrix(spark):
    img = np.zeros((2, 2), dtype=np.uint8)
    good = _write_tiff([img])
    with pytest.raises(ValueError, match="byte-order"):
        _tiff_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        _tiff_decode(good[:2] + struct.pack("<HI", 41, 8) + good[8:])
    # dimension bomb: blow up width/height via the IFD on a tiny payload
    huge = np.zeros((1, 1), dtype=np.uint8)
    blob = bytearray(_write_tiff([huge]))
    # patch width+height entries to 1<<20 each
    n = struct.unpack_from("<H", blob, struct.unpack_from("<I", blob, 4)[0])[0]
    ifd = struct.unpack_from("<I", blob, 4)[0]
    for i in range(n):
        pos = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", blob, pos)[0]
        if tag in (256, 257):
            # SHORT-typed tags: the value sits in the slot's low 16 bits
            struct.pack_into("<H", blob, pos + 8, 65535)
    with pytest.raises(ValueError, match="exceed"):
        _tiff_decode(bytes(blob))
    lzw = bytearray(good)
    n = struct.unpack_from("<H", lzw, struct.unpack_from("<I", lzw, 4)[0])[0]
    ifd = struct.unpack_from("<I", lzw, 4)[0]
    for i in range(n):
        pos = ifd + 2 + 12 * i
        if struct.unpack_from("<H", lzw, pos)[0] == 259:
            struct.pack_into("<I", lzw, pos + 8, 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        _tiff_decode(bytes(lzw))


def test_spark_lanes(spark):
    from drill_logfile_plugin_spark.operators.multimodal import (
        decode_media,
        extract_features,
        phash_signatures,
    )

    rng = np.random.default_rng(6)
    rows = [
        (i, _write_tiff([rng.integers(0, 256, size=(8, 8), dtype=np.uint8)]))
        for i in range(3)
    ] + [(9, b"II*\x00garbage")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r["doc_id"]: r for r in decode_media(df, codec="tiff").collect()}
    assert meta[0]["media_format"] == "tiff"
    assert (meta[0]["width"], meta[0]["height"]) == (8, 8)
    assert meta[9]["width"] is None  # quarantined
    feats = extract_features(df, codec="tiff", dim=8, on_error="skip").collect()
    assert len(feats) == 3
    sigs = phash_signatures(df, codec="tiff").collect()
    assert len(sigs) == 3
