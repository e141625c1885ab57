"""TIFF codec: exact luma recovery against an independent in-test writer
(IFD chains packed per the TIFF 6.0 spec, both byte orders, multi-strip,
gray/min-is-white/RGB, LZW §13 with early change + 4094 Clear, PackBits
§9, Predictor 2), multi-page first-page convention, the rejection
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


def _lzw_encode(data: bytes) -> bytes:
    """Independent spec-following TIFF §13 LZW encoder: MSB-first bit
    packing, Clear=256/EOI=257, entries from 258, the EARLY-CHANGE
    convention (the emit width serves the DECODER, whose table lags the
    encoder's by one entry — so this encoder tracks the decoder's table
    length directly, the same mirror idiom as the GIF test encoder, and
    widens when that length reaches 2^width - 1, per libtiff), and the
    mandatory Clear when the encoder table reaches 4094 entries."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {}
    next_code = 0
    width = 0
    dec_len = 0

    def reset() -> None:
        nonlocal table, next_code, width, dec_len
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        dec_len = 258

    reset()
    put(clear, width)
    prev = b""
    first_after_clear = True
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        if not first_after_clear:
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < 12:
                width += 1
        first_after_clear = False
        table[cur] = next_code
        next_code += 1
        prev = bytes([b])
        if next_code == 4094:
            put(table[prev], width)
            # the decoder appends for this code too before seeing Clear
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < 12:
                width += 1
            put(clear, width)
            reset()
            prev = b""
            first_after_clear = True
    if prev:
        put(table[prev], width)
        if not first_after_clear:
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < 12:
                width += 1
    put(eoi, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Independent TIFF §9 PackBits encoder: repeat packets for runs of
    >= 2 (max 128), literal packets otherwise (broken before any run of
    >= 3, max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _hdiff(img: np.ndarray) -> np.ndarray:
    """Predictor-2 horizontal differencing (per row, per sample channel,
    mod 2^bits) — what an encoder applies BEFORE compression."""
    a = img if img.ndim == 3 else img[:, :, None]
    d = a.astype(np.int64)
    d[:, 1:, :] -= a[:, :-1, :].astype(np.int64)
    d = (d % (1 << (8 * a.dtype.itemsize))).astype(img.dtype)
    return d.reshape(img.shape)


def _write_tiff(
    pages,
    endian="<",
    rows_per_strip=None,
    photometric=None,
    compression=1,
    predictor=None,
    strip_payloads=None,
    extra_tags=None,
    tile=None,
    planar=1,
    bilevel=False,
):
    """Independent spec-following writer. ``pages`` is a list of either
    (h, w) gray arrays or (h, w, 3) RGB arrays; each page gets its own
    IFD; strips split at ``rows_per_strip`` (default: whole image),
    each compressed as its own stream (1=none, 5=LZW, 32773=PackBits);
    predictor=2 applies horizontal differencing before compression.
    ``strip_payloads`` (list per page of prebuilt strip bytes) bypasses
    the pixel packing — the JPEG-in-TIFF layout, where strips are JPEG
    streams; ``extra_tags`` appends (tag, typ, vals) entries (e.g.
    JPEGTables)."""
    bom = b"II" if endian == "<" else b"MM"
    out = bytearray(bom + struct.pack(endian + "HI", 42, 0))
    ifd_offsets = []
    for page_no, img in enumerate(pages):
        rgb = img.ndim == 3
        h, w = img.shape[:2]
        spp = 3 if rgb else 1
        bits = 1 if bilevel else 8 * img.dtype.itemsize
        rps = rows_per_strip or h

        def pack(arr):
            """Segment samples -> bytes in the file's byte order (1-bit:
            MSB-first, each row byte-aligned — packbits per row)."""
            if bilevel:
                return np.packbits(arr[:, :, 0] & 1, axis=1).tobytes()
            return arr.astype(np.dtype(endian + f"u{img.dtype.itemsize}")
                              ).tobytes()

        def comp(raw):
            if compression == 5:
                return _lzw_encode(raw)
            if compression == 32773:
                return _packbits_encode(raw)
            return raw

        def seg_bytes(seg):
            # predictor applies per SEGMENT: a tile row restarts its
            # differencing at the tile's left edge
            if predictor == 2:
                seg = _hdiff(seg)
            return comp(pack(seg))

        if strip_payloads is not None:
            strips = list(strip_payloads[page_no])
        else:
            src3 = img if img.ndim == 3 else img[:, :, None]
            strips = []
            plane_views = (
                [src3[:, :, p : p + 1] for p in range(spp)]
                if planar == 2
                else [src3]
            )
            for pv in plane_views:
                if tile:
                    twd, tht = tile
                    ph = (h + tht - 1) // tht * tht
                    pw = (w + twd - 1) // twd * twd
                    padded = np.zeros(
                        (ph, pw, pv.shape[2]), dtype=img.dtype
                    )
                    padded[:h, :w] = pv
                    for y0 in range(0, ph, tht):
                        for x0 in range(0, pw, twd):
                            strips.append(seg_bytes(
                                padded[y0 : y0 + tht, x0 : x0 + twd]
                            ))
                else:
                    for y0 in range(0, h, rps):
                        strips.append(seg_bytes(pv[y0 : y0 + rps]))
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
        photo = photometric if photometric is not None else (2 if rgb else 1)

        def entry(tag, typ, vals):
            count = len(vals)
            fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
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
            (258, 3, [bits] * spp),
            (259, 3, [compression]),
            (262, 3, [photo]),
            (277, 3, [spp]),
        ]
        if tile:
            tags += [
                (322, 3, [tile[0]]),
                (323, 3, [tile[1]]),
                (324, 4, strip_offsets),
                (325, 4, [len(s) for s in strips]),
            ]
        else:
            tags += [
                (273, 4, strip_offsets),
                (278, 3, [rps]),
                (279, 4, [len(s) for s in strips]),
            ]
        if planar != 1:
            tags.append((284, 3, [planar]))
        if predictor is not None:
            tags.append((317, 3, [predictor]))
        if extra_tags:
            tags.extend(extra_tags)
        tags.sort(key=lambda t: t[0])  # spec: ascending tag order
        ifd_off = len(out)
        ifd_offsets.append(ifd_off)
        n = len(tags)
        extras = bytearray()
        extras_base = ifd_off + 2 + 12 * n + 4
        body = bytearray(struct.pack(endian + "H", n))
        for tag, typ, vals in tags:
            fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
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
    def _patch_compression(value):
        blob2 = bytearray(good)
        cnt = struct.unpack_from(
            "<H", blob2, struct.unpack_from("<I", blob2, 4)[0]
        )[0]
        ifd2 = struct.unpack_from("<I", blob2, 4)[0]
        for i in range(cnt):
            pos = ifd2 + 2 + 12 * i
            if struct.unpack_from("<H", blob2, pos)[0] == 259:
                struct.pack_into("<I", blob2, pos + 8, value)
        return bytes(blob2)

    # Deflate-in-TIFF (8) stays a plug-in point
    with pytest.raises(NotImplementedError, match="compression 8"):
        _tiff_decode(_patch_compression(8))
    # CCITT (4) decodes since r10 — but only on 1-bit single-sample data
    with pytest.raises(ValueError, match="1-bit"):
        _tiff_decode(_patch_compression(4))
    fp3 = _write_tiff([img], predictor=3)
    with pytest.raises(NotImplementedError, match="predictor 3"):
        _tiff_decode(fp3)


def test_lzw_exact_both_endians_multistrip(spark):
    rng = np.random.default_rng(11)
    # structured + noisy mix: repeats exercise multi-byte table entries
    base = np.tile(np.arange(16, dtype=np.uint8) * 16, (12, 2))
    img = (base + rng.integers(0, 8, size=(12, 32), dtype=np.uint8)).astype(
        np.uint8
    )
    for endian in ("<", ">"):
        blob = _write_tiff(
            [img], endian=endian, rows_per_strip=5, compression=5
        )
        w, h, luma = _tiff_decode(blob)
        assert (w, h) == (32, 12)
        assert np.array_equal(luma, img)


def test_lzw_rgb_with_predictor2(spark):
    rng = np.random.default_rng(12)
    # smooth gradient: the case predictor 2 exists for
    ramp = np.linspace(0, 255, 24, dtype=np.uint8)
    img = np.stack(
        [np.tile(ramp, (10, 1)) + c for c in (0, 3, 7)], axis=2
    ).astype(np.uint8)
    blob = _write_tiff([img], rows_per_strip=4, compression=5, predictor=2)
    w, h, luma = _tiff_decode(blob)
    assert (w, h) == (24, 10)
    for y in range(10):
        for x in range(24):
            assert luma[y, x] == _luma(*img[y, x])
    # predictor on uncompressed strips decodes too (legal, unusual)
    blob = _write_tiff([img], compression=1, predictor=2)
    _, _, luma1 = _tiff_decode(blob)
    assert np.array_equal(luma1, luma)


def test_lzw_early_change_and_4094_clear(spark):
    """A strip large and noisy enough that the code table crosses the
    9->10->11->12-bit early-change boundaries AND the 4094-entry Clear:
    random bytes rarely extend prefixes, so the table grows ~1 entry per
    input byte (>= 6000 entries here). Exact recovery pins the width
    schedule at every boundary; encoder and decoder are separate
    implementations of the convention (the test encoder mirrors the
    DECODER's table length like the GIF pair, widening at 2^w - 1)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(50, 128), dtype=np.uint8)
    enc = _lzw_encode(img.tobytes())
    assert 256 in _lzw_codes_hist(enc)  # the mid-stream Clear happened
    blob = _write_tiff([img], compression=5)
    w, h, luma = _tiff_decode(blob)
    assert (w, h) == (128, 50)
    assert np.array_equal(luma, img)


def _lzw_codes_hist(enc: bytes) -> set:
    """Replay the width schedule over an encoded stream and return the
    set of codes seen (decoder-convention widths; used to assert the
    4094 Clear actually occurs mid-stream)."""
    seen = set()
    pos = 0
    acc = nbits = 0
    width = 9
    dec_len = 258
    first = True
    while pos < len(enc) or nbits >= width:
        while nbits < width:
            if pos >= len(enc):
                return seen
            acc = (acc << 8) | enc[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        acc &= (1 << (nbits - width)) - 1
        nbits -= width
        if code == 257:
            return seen
        if code == 256:
            if not first:
                seen.add(256)
            width, dec_len, first = 9, 258, True
            continue
        if not first:
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < 12:
                width += 1
        first = False
    return seen


def test_packbits_exact_runs_and_literals(spark):
    rng = np.random.default_rng(14)
    # flat regions (runs) + noise (literals) + a 300-px run crossing the
    # 128-byte packet cap
    img = np.concatenate(
        [
            np.full((4, 90), 7, dtype=np.uint8),
            rng.integers(0, 256, size=(4, 90), dtype=np.uint8),
            np.full((4, 90), 201, dtype=np.uint8),
        ],
        axis=0,
    )
    blob = _write_tiff([img], rows_per_strip=5, compression=32773)
    w, h, luma = _tiff_decode(blob)
    assert (w, h) == (90, 12)
    assert np.array_equal(luma, img)
    rgb = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    _, _, lrgb = _tiff_decode(_write_tiff([rgb], compression=32773))
    for y in range(6):
        for x in range(9):
            assert lrgb[y, x] == _luma(*rgb[y, x])


def test_corrupt_compressed_strips_raise_valueerror(spark):
    img = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(_write_tiff([img], compression=5))
    strip_off = struct.unpack_from(
        "<I",
        blob,
        _find_tag_slot(blob, 273),
    )[0]
    blob[strip_off] = 0xFF  # first 9-bit code becomes out-of-sequence
    blob[strip_off + 1] = 0xFF
    with pytest.raises(ValueError, match="LZW"):
        _tiff_decode(bytes(blob))
    pb = bytearray(_write_tiff([img], compression=32773))
    off = struct.unpack_from("<I", pb, _find_tag_slot(pb, 273))[0]
    pb[off] = 127  # literal packet claiming 128 bytes that aren't there
    del pb[off + 1 :]
    # strip table now points past the end
    with pytest.raises(ValueError):
        _tiff_decode(bytes(pb))


def _find_tag_slot(blob, tag):
    ifd = struct.unpack_from("<I", blob, 4)[0]
    n = struct.unpack_from("<H", blob, ifd)[0]
    for i in range(n):
        pos = ifd + 2 + 12 * i
        if struct.unpack_from("<H", blob, pos)[0] == tag:
            return pos + 8
    raise AssertionError(f"tag {tag} not found")


def test_spark_lane_lzw(spark):
    from drill_logfile_plugin_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(15)
    rows = [
        (
            i,
            _write_tiff(
                [rng.integers(0, 256, size=(8, 8), dtype=np.uint8)],
                compression=5,
                predictor=2,
            ),
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r["doc_id"]: r for r in decode_media(df, codec="tiff").collect()}
    assert all(
        (meta[i]["width"], meta[i]["height"]) == (8, 8) for i in range(3)
    )


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


# --- JPEG-in-TIFF (compression 7, TIFF Tech Note 2; r8) -----------------


def _split_jpeg_tables(stream: bytes):
    """Factor DQT/DHT/DRI segments out of a complete JPEG stream into a
    JPEGTables abbreviated stream (SOI + table segments + EOI), leaving
    an abbreviated image stream — the Tech Note 2 layout an encoder
    writes when strips share tables."""
    assert stream[:2] == b"\xff\xd8"
    pos = 2
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data through EOI
            image += stream[pos:]
            break
        seg_len = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        seg = stream[pos : pos + 2 + seg_len]
        if marker in (0xDB, 0xC4, 0xDD):
            tables += seg
        else:
            image += seg
        pos += 2 + seg_len
    tables += b"\xff\xd9"
    return bytes(tables), bytes(image)


def _jpeg_strip_tiff(img, rps, factor_tables):
    """Build a JPEG-in-TIFF: each strip its own baseline JPEG (in-test
    encoder from the JPEG pin suite); optionally factor shared tables
    into the JPEGTables tag."""
    from tests.test_jpeg_codec import encode_jpeg

    h, w = img.shape
    q = np.full(64, 3, dtype=np.int64)  # zigzag-order table
    q[0] = 1
    streams = []
    for y0 in range(0, h, rps):
        rows = img[y0 : y0 + rps]
        sh = rows.shape[0]
        # pad the strip plane up to 8-row MCU multiples (the spec allows
        # MCU-padded strips; the decoder must crop)
        ph = (sh + 7) // 8 * 8
        pw = (w + 7) // 8 * 8
        plane = np.zeros((ph, pw), dtype=np.uint8)
        plane[:sh, :w] = rows
        payload, _ = encode_jpeg(
            {1: plane}, w, sh, {1: (1, 1)}, q
        )
        streams.append(payload)
    extra = None
    if factor_tables:
        tables0, _ = _split_jpeg_tables(streams[0])
        streams = [_split_jpeg_tables(s)[1] for s in streams]
        extra = [(347, 7, list(tables0))]
    return _write_tiff(
        [img],
        rows_per_strip=rps,
        photometric=6,  # YCbCr — the JPEG-in-TIFF convention
        compression=7,
        strip_payloads=[streams],
        extra_tags=extra,
    )


def test_jpeg_in_tiff_single_and_multi_strip(spark):
    """Compression 7 composes the certified JPEG decoder: the TIFF luma
    equals decoding the identical JPEG streams directly, single-strip
    and multi-strip (incl. an MCU-padded last strip, cropped)."""
    from drill_logfile_plugin_spark.operators.jpeg import _jpeg_decode
    from tests.test_jpeg_codec import encode_jpeg

    rng = np.random.default_rng(21)
    img = (rng.integers(0, 32, size=(21, 17), dtype=np.uint8) * 8).astype(
        np.uint8
    )
    # ground truth: decode each strip's stream directly and stack
    def want(rps):
        rows = []
        q = np.full(64, 3, dtype=np.int64)
        q[0] = 1
        for y0 in range(0, 21, rps):
            sh = img[y0 : y0 + rps].shape[0]
            ph = (sh + 7) // 8 * 8
            plane = np.zeros((ph, 24), dtype=np.uint8)
            plane[:sh, :17] = img[y0 : y0 + rps]
            payload, _ = encode_jpeg({1: plane}, 17, sh, {1: (1, 1)}, q)
            _, _, g = _jpeg_decode(payload)
            rows.append(g[:sh, :17])
        return np.concatenate(rows, axis=0)

    for rps in (21, 8, 5):
        w, h, luma = _tiff_decode(_jpeg_strip_tiff(img, rps, False))
        assert (w, h) == (17, 21)
        assert np.array_equal(luma, want(rps)), rps


def test_jpeg_in_tiff_jpegtables_factoring(spark):
    """The JPEGTables layout (shared DQT/DHT factored into tag 347,
    abbreviated per-strip streams) decodes IDENTICALLY to the
    self-contained-strips layout. Strips share content statistics (an
    encoder factors tables precisely when they're common); a third
    strip keeps its own LOCAL tables in-stream, which must override the
    spliced defaults (the Tech Note 2 precedence rule)."""
    rng = np.random.default_rng(22)
    band = (rng.integers(0, 32, size=(8, 16), dtype=np.uint8) * 8).astype(
        np.uint8
    )
    img = np.tile(band, (2, 1))  # two identical strips at rps=8
    full = _tiff_decode(_jpeg_strip_tiff(img, 8, False))
    factored = _tiff_decode(_jpeg_strip_tiff(img, 8, True))
    assert np.array_equal(full[2], factored[2])
    assert full[:2] == factored[:2] == (16, 16)
    # local-override: strip 2 has DIFFERENT content and carries its own
    # complete tables in-stream while JPEGTables still holds strip 0's
    from tests.test_jpeg_codec import encode_jpeg

    other = (255 - band).astype(np.uint8)
    q = np.full(64, 3, dtype=np.int64)
    q[0] = 1
    s_shared, _ = encode_jpeg({1: band}, 16, 8, {1: (1, 1)}, q)
    s_local, _ = encode_jpeg({1: other}, 16, 8, {1: (1, 1)}, q)
    tables, abbrev = _split_jpeg_tables(s_shared)
    mixed = _write_tiff(
        [np.vstack([band, band, other])],
        rows_per_strip=8,
        photometric=6,
        compression=7,
        strip_payloads=[[abbrev, abbrev, s_local]],
        extra_tags=[(347, 7, list(tables))],
    )
    w, h, luma = _tiff_decode(mixed)
    assert (w, h) == (16, 24)
    ref = _tiff_decode(_jpeg_strip_tiff(np.vstack([band, band, other]), 8, False))[2]
    assert np.array_equal(luma, ref)


def test_jpeg_in_tiff_rejections(spark):
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    # a strip that is not a JPEG stream
    blob = _write_tiff(
        [img],
        compression=7,
        photometric=6,
        strip_payloads=[[b"not a jpeg"]],
    )
    with pytest.raises(ValueError, match="SOI"):
        _tiff_decode(blob)
    # a JPEG smaller than the declared strip geometry (patch width only:
    # patching height too would change the strip COUNT the geometry
    # expects, which the segment-table check catches first)
    small = _jpeg_strip_tiff(img[:4, :4], 4, False)
    b = bytearray(small)
    struct.pack_into("<H", b, _find_tag_slot(b, 256), 8)
    with pytest.raises(ValueError, match="smaller"):
        _tiff_decode(bytes(b))
    # and the declared-more-strips-than-present case is its own error
    b2 = bytearray(small)
    struct.pack_into("<H", b2, _find_tag_slot(b2, 257), 8)
    with pytest.raises(ValueError, match="geometry needs"):
        _tiff_decode(bytes(b2))
    # corrupt JPEGTables
    blob = _write_tiff(
        [img],
        compression=7,
        photometric=6,
        strip_payloads=[[b"\xff\xd8rest"]],
        extra_tags=[(347, 7, list(b"bogus!"))],
    )
    with pytest.raises(ValueError, match="JPEGTables"):
        _tiff_decode(blob)


# --- tiles, 16-bit samples, planar configuration 2 (r8) ------------------


def test_tiled_gray_and_rgb_exact(spark):
    """Tiled layout (tags 322-325): tiles padded to full size, decoder
    crops edge tiles; exact recovery gray and RGB, uncompressed and
    LZW+predictor, both endians."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(21, 13), dtype=np.uint8)
    for endian in ("<", ">"):
        w, h, luma = _tiff_decode(
            _write_tiff([img], endian=endian, tile=(8, 8))
        )
        assert (w, h) == (13, 21)
        assert np.array_equal(luma, img)
    rgb = rng.integers(0, 256, size=(10, 18, 3), dtype=np.uint8)
    _, _, lr = _tiff_decode(
        _write_tiff([rgb], tile=(16, 4), compression=5, predictor=2)
    )
    for y in range(10):
        for x in range(18):
            assert lr[y, x] == _luma(*rgb[y, x])


def test_16bit_samples_high_byte_luma(spark):
    """BitsPerSample 16 (both endians, LZW + predictor-2 included):
    decoded luma is the high byte of each 16-bit sample (gray) / the
    BT.601 combination of high bytes (RGB)."""
    rng = np.random.default_rng(32)
    img = rng.integers(0, 1 << 16, size=(9, 11), dtype=np.uint16)
    for endian in ("<", ">"):
        for kw in (dict(), dict(compression=5, predictor=2)):
            w, h, luma = _tiff_decode(
                _write_tiff([img], endian=endian, rows_per_strip=4, **kw)
            )
            assert (w, h) == (11, 9), kw
            assert np.array_equal(luma, (img >> 8).astype(np.uint8)), kw
    rgb = rng.integers(0, 1 << 16, size=(5, 6, 3), dtype=np.uint16)
    _, _, lr = _tiff_decode(_write_tiff([rgb]))
    hi = (rgb >> 8).astype(np.uint8)
    for y in range(5):
        for x in range(6):
            assert lr[y, x] == _luma(*hi[y, x])
    # 16-bit min-is-white inverts on the 8-bit luma
    _, _, inv = _tiff_decode(_write_tiff([img], photometric=0))
    assert np.array_equal(inv, 255 - (img >> 8).astype(np.uint8))


def test_planar2_separate_planes(spark):
    """Planar configuration 2: per-channel planes stored sequentially
    (strips AND tiles), exact luma; identical to the chunky layout."""
    rng = np.random.default_rng(33)
    rgb = rng.integers(0, 256, size=(12, 7, 3), dtype=np.uint8)
    chunky = _tiff_decode(_write_tiff([rgb]))[2]
    for kw in (
        dict(rows_per_strip=5),
        dict(rows_per_strip=5, compression=32773),
        dict(tile=(4, 8), compression=5, predictor=2),
    ):
        _, _, luma = _tiff_decode(_write_tiff([rgb], planar=2, **kw))
        assert np.array_equal(luma, chunky), kw
    # 16-bit planar 2 composes too
    rgb16 = rng.integers(0, 1 << 16, size=(6, 6, 3), dtype=np.uint16)
    a = _tiff_decode(_write_tiff([rgb16]))[2]
    b = _tiff_decode(_write_tiff([rgb16], planar=2, rows_per_strip=2))[2]
    assert np.array_equal(a, b)


def test_jpeg_in_tiff_tiled(spark):
    """Compression 7 over a TILED layout: each tile its own JPEG,
    edge tiles cropped — equals the single-strip JPEG decode."""
    from tests.test_jpeg_codec import encode_jpeg

    rng = np.random.default_rng(34)
    band = (rng.integers(0, 32, size=(8, 8), dtype=np.uint8) * 8).astype(
        np.uint8
    )
    img = np.tile(band, (2, 3))[:13, :20]  # 13x20: ragged edge tiles
    q = np.full(64, 3, dtype=np.int64)
    q[0] = 1
    tiles = []
    for y0 in range(0, 16, 8):
        for x0 in range(0, 24, 8):
            padded = np.zeros((8, 8), dtype=np.uint8)
            block = np.tile(band, (2, 3))[y0 : y0 + 8, x0 : x0 + 8]
            padded[: block.shape[0], : block.shape[1]] = block
            payload, _ = encode_jpeg({1: padded}, 8, 8, {1: (1, 1)}, q)
            tiles.append(payload)
    blob = _write_tiff(
        [img],
        photometric=6,
        compression=7,
        tile=(8, 8),
        strip_payloads=[tiles],
    )
    w, h, luma = _tiff_decode(blob)
    assert (w, h) == (20, 13)
    # reference: decode each tile stream directly and paste
    from drill_logfile_plugin_spark.operators.jpeg import _jpeg_decode

    want = np.zeros((13, 20), dtype=np.uint8)
    i = 0
    for y0 in range(0, 16, 8):
        for x0 in range(0, 24, 8):
            _, _, g = _jpeg_decode(tiles[i])
            rows = min(8, 13 - y0)
            cols = min(8, 20 - x0)
            if rows > 0 and cols > 0:
                want[y0 : y0 + rows, x0 : x0 + cols] = g[:rows, :cols]
            i += 1
    assert np.array_equal(luma, want)


def test_tile_and_depth_rejections(spark):
    img = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(_write_tiff([img], tile=(4, 4)))
    struct.pack_into("<H", blob, _find_tag_slot(blob, 322), 0)
    with pytest.raises(ValueError, match="tile dimensions"):
        _tiff_decode(bytes(blob))
    img1 = np.zeros((2, 2), dtype=np.uint8)
    b = bytearray(_write_tiff([img1]))
    struct.pack_into("<H", b, _find_tag_slot(b, 258), 4)
    with pytest.raises(NotImplementedError, match="BitsPerSample"):
        _tiff_decode(bytes(b))


def test_bilevel_1bit(spark):
    """1-bit bilevel (the scan-mask baseline): MSB-first row-aligned
    packing unpacks to {0,255} luma under both photometrics, through
    strips, ragged widths (row byte padding), PackBits, LZW, and tiles."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 2, size=(11, 19), dtype=np.uint8)  # 19: ragged
    # photometric 1 (BlackIsZero): bit 1 -> 255
    w, h, luma = _tiff_decode(
        _write_tiff([img], bilevel=True, rows_per_strip=4)
    )
    assert (w, h) == (19, 11)
    assert np.array_equal(luma, img * 255)
    # photometric 0 (WhiteIsZero): bit 0 -> 255
    _, _, inv = _tiff_decode(
        _write_tiff([img], bilevel=True, photometric=0)
    )
    assert np.array_equal(inv, (1 - img) * 255)
    # compressed and tiled lanes
    for kw in (
        dict(compression=32773),
        dict(compression=5),
        dict(tile=(8, 8)),
        dict(tile=(8, 8), compression=5),
    ):
        _, _, l2 = _tiff_decode(_write_tiff([img], bilevel=True, **kw))
        assert np.array_equal(l2, img * 255), kw
    # predictor 2 on 1-bit is undefined
    blob = _write_tiff([img], bilevel=True, predictor=2)
    with pytest.raises(ValueError, match="1-bit"):
        _tiff_decode(blob)
