"""TIFF decoder — stdlib + numpy, uncompressed baseline profiles.

TIFF is the scanned-document and scientific-imaging container (faxes,
digitized archives, satellite tiles) — the other uncompressed format a
document crawl actually serves next to BMP. A TIFF is a byte-order mark
(``II``/``MM``), a magic 42, and a chain of IFDs (image file
directories) whose tagged entries describe strips of pixel data.
Decoded to the package's standard ``(width, height, luma)`` contract, so
TIFF drops into the multimodal lanes unchanged.

Supported: BOTH byte orders; BitsPerSample 1 (bilevel scan masks —
MSB-first row-aligned bits unpack to 0/255 luma), 8 AND 16 (16-bit
samples map to the luma contract via their high byte), grayscale
(min-is-black and min-is-white) and RGB (BT.601 integer luma); STRIP layout at any
RowsPerStrip and TILED layout (tags 322-325; tiles padded to full size,
edge tiles cropped); planar configuration 1 (chunky) and 2 (per-channel
planes stored sequentially); the FIRST IFD (multi-page TIFFs decode
their first page — the keyframe convention; page count is surfaced);
compression 1 (uncompressed), 5 (LZW — MSB-first variable-width codes
with the TIFF "early change" off-by-one and the 4094-entry Clear
discipline, §13) and 32773 (PackBits run-length, §9), each segment its
own stream bounded by its declared pixel bytes (bomb guard); Predictor
2 (horizontal differencing — the tag real-world LZW scans ship) undone
per segment row and sample channel at either depth; compression 7
(JPEG-in-TIFF, TIFF Tech Note 2) by composing the certified JPEG
decoder — per-strip or per-tile complete or abbreviated streams with
JPEGTables (tag 347) defaults spliced after each segment's SOI,
MCU-padded segments cropped; compressions 2/3/4 (CCITT MH / G3 with
EOL framing and the mixed-mode tag bit / G4 MMR) via the from-scratch
ITU T.4/T.6 decoder (operators/ccitt.py — round 10 closed the former
named quarantine with the in-test independent-encoder discipline),
honoring both photometrics and T4Options/T6Options with the
uncompressed-mode bits as explicit plug-in points. 4-bit samples and
JPEG-with-16-bit/planar-2 raise NotImplementedError — explicit plug-in
points. Dimension/size sanity precedes any allocation (untrusted
headers).

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import struct

_TIFF_MAX_PIXELS = 64_000_000

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_JPEG_TABLES = 347

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """TIFF §9 PackBits: control byte n in 0..127 copies the next n+1
    bytes literally; 129..255 repeats the next byte 257-n times; 128 is a
    no-op. Self-delimiting, so rows packed separately decode straight
    through as one concatenated stream. Output is hard-bounded by the
    strip's declared pixel bytes — decoding stops at ``max_out`` (spec
    allows trailing pad), and a crafted stream cannot out-allocate the
    image it claims to be."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < max_out:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise ValueError("TIFF PackBits literal run truncated")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n == 128:
            continue
        else:
            if pos >= len(data):
                raise ValueError("TIFF PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    return bytes(out[:max_out])


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF §13 LZW: MSB-first bit packing, 9-bit initial codes, Clear=256,
    EOI=257, new entries from 258. Code width grows with the TIFF "early
    change" convention — one code EARLIER than generic LZW: after adding
    an entry, when the table holds 2^width - 1 entries the next code is
    read at width+1 (libtiff-compatible; GIF's variant in operators/
    gif.py switches at 2^width). Encoders emit Clear at 4094 entries, so
    the table never needs more than 12 bits. Output bounded by the
    strip's declared pixel bytes (bomb guard)."""
    clear, eoi = 256, 257
    out = bytearray()
    table: list[bytes] = []
    code_size = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_size = 9
        prev = None

    reset()
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated (no EOI)")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        shift = nbits - code_size
        code = (acc >> shift) & ((1 << code_size) - 1)
        acc &= (1 << shift) - 1
        nbits = shift

        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if code < clear or eoi < code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW code out of sequence")
        out += entry
        if len(out) > max_out:
            raise ValueError("TIFF LZW output exceeds declared strip size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = entry


def _read_ifd(data: bytes, off: int, endian: str):
    """Parse one IFD into {tag: [values...]}; returns (fields, next_off)."""
    if off + 2 > len(data):
        raise ValueError("TIFF IFD offset out of range")
    (n,) = struct.unpack_from(endian + "H", data, off)
    fields: dict[int, list[int]] = {}
    pos = off + 2
    if pos + 12 * n + 4 > len(data):
        raise ValueError("TIFF IFD truncated")
    for _ in range(n):
        tag, typ, count = struct.unpack_from(endian + "HHI", data, pos)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", data, pos + 8)
            if voff + size > len(data):
                raise ValueError(f"TIFF tag {tag} value out of range")
        if typ == 3:
            vals = list(
                struct.unpack_from(endian + f"{count}H", data, voff)
            )
        elif typ == 4:
            vals = list(
                struct.unpack_from(endian + f"{count}I", data, voff)
            )
        elif typ in (1, 6, 7):  # BYTE / SBYTE / UNDEFINED (JPEGTables)
            vals = list(data[voff : voff + count])
        else:
            vals = []  # rationals/ascii etc. — not needed for pixels
        fields[tag] = vals
        pos += 12
    (nxt,) = struct.unpack_from(endian + "I", data, pos)
    return fields, nxt


def _tiff_decode(payload: bytes):
    """Decode a TIFF's first page to ``(width, height, luma)``; also
    counts pages (walked, not decoded) for the metadata lane via
    :func:`_tiff_pages`."""
    import numpy as np

    if len(payload) < 8:
        raise ValueError("not a TIFF (truncated header)")
    bom = payload[:2]
    if bom == b"II":
        endian = "<"
    elif bom == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, first_ifd = struct.unpack_from(endian + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"not a TIFF (magic {magic}, expected 42)")
    fields, _ = _read_ifd(payload, first_ifd, endian)

    def one(tag, default=None):
        v = fields.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width = one(_T_WIDTH)
    height = one(_T_HEIGHT)
    if width <= 0 or height <= 0:
        raise ValueError(f"TIFF with invalid dimensions {width}x{height}")
    if width * height > _TIFF_MAX_PIXELS:
        raise ValueError(
            f"TIFF dimensions {width}x{height} exceed the decoder bound"
        )
    compression = one(_T_COMPRESSION, 1)
    if compression not in (1, 2, 3, 4, 5, 7, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression}: uncompressed (1), CCITT "
            "MH/G3/G4 (2/3/4), LZW (5), JPEG (7) and PackBits (32773) "
            "are supported"
        )
    ccitt_mode = None
    if compression in (2, 3, 4):
        # TIFF 6 §10-11: fax codings are bilevel single-sample only
        if fields.get(_T_BITS, [1])[0] != 1 or one(_T_SAMPLES_PER_PIXEL, 1) != 1:
            raise ValueError(
                "TIFF CCITT compression requires 1-bit single-sample data"
            )
        if compression == 2:
            ccitt_mode = "mh"  # rows begin on byte boundaries (§10)
        elif compression == 3:
            t4opts = one(292, 0)  # T4Options
            if t4opts & 2:
                raise NotImplementedError(
                    "TIFF T4Options uncompressed mode is a plug-in point"
                )
            ccitt_mode = "g3-2d" if t4opts & 1 else "g3"
        else:
            t6opts = one(293, 0)  # T6Options
            if t6opts & 2:
                raise NotImplementedError(
                    "TIFF T6Options uncompressed mode is a plug-in point"
                )
            ccitt_mode = "g4"
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor}: none (1) and horizontal "
            "differencing (2) are supported; floating-point (3) is a "
            "plug-in point"
        )
    spp = one(_T_SAMPLES_PER_PIXEL, 1)
    bits = fields.get(_T_BITS, [8])
    if len(set(bits)) != 1 or bits[0] not in (1, 8, 16):
        raise NotImplementedError(
            f"TIFF BitsPerSample {bits}: 1-bit bilevel and 8/16-bit "
            "samples supported; 4-bit and mixed depths are plug-in points"
        )
    if bits[0] == 1 and spp != 1:
        raise NotImplementedError(
            "TIFF 1-bit samples are bilevel (SamplesPerPixel 1) only"
        )
    bilevel = bits[0] == 1
    bps = 1 if bilevel else bits[0] // 8  # bytes per (unpacked) sample
    planar = one(_T_PLANAR, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF planar configuration {planar} is invalid")
    if spp == 1:
        planar = 1  # one plane: the two layouts are identical
    photometric = one(_T_PHOTOMETRIC, 1)
    if spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF SamplesPerPixel {spp}: 1 (gray) and 3 (RGB) supported"
        )

    # segment geometry: tiled (tags 322-325; tiles are PADDED to full
    # tile size — paste crops) or stripped (strips hold exactly their
    # rows). planar 2 repeats the per-plane segment list once per
    # sample channel, planes stored sequentially (TIFF 6.0 §14).
    tiled = _T_TILE_OFFSETS in fields
    if tiled:
        tw = one(_T_TILE_WIDTH)
        th = one(_T_TILE_LENGTH)
        if tw <= 0 or th <= 0:
            raise ValueError("TIFF tile dimensions must be positive")
        offsets = fields.get(_T_TILE_OFFSETS)
        counts = fields.get(_T_TILE_COUNTS)
        across = -(-width // tw)
        down = -(-height // th)
        geo = []  # (x0, y0, buf_cols, buf_rows) per in-plane segment
        for ty in range(down):
            for tx in range(across):
                geo.append((tx * tw, ty * th, tw, th))
    else:
        offsets = fields.get(_T_STRIP_OFFSETS)
        counts = fields.get(_T_STRIP_COUNTS)
        rps = min(one(_T_ROWS_PER_STRIP, height), height)
        if rps <= 0:
            raise ValueError("TIFF RowsPerStrip must be positive")
        geo = []
        y0 = 0
        while y0 < height:
            geo.append((0, y0, width, min(rps, height - y0)))
            y0 += rps
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF segment tables missing or inconsistent")
    planes = spp if planar == 2 else 1
    if len(offsets) < len(geo) * planes:
        raise ValueError(
            f"TIFF has {len(offsets)} segments, geometry needs "
            f"{len(geo) * planes}"
        )
    if compression == 7:
        # JPEG-in-TIFF (TIFF Tech Note 2): each segment (strip OR tile)
        # is a complete or abbreviated JPEG stream; shared tables may be
        # factored into the JPEGTables tag (an abbreviated SOI..EOI
        # stream) and are spliced after each segment's SOI — DQT/DHT
        # segments are position-independent before SOF/SOS, and any
        # table a segment redefines locally simply overwrites the
        # spliced default. The JPEG luma plane IS the (width, height,
        # luma) contract (for photometric 6/YCbCr the Y channel is
        # BT.601 luma by definition), so this composes the certified
        # JPEG decoder (operators/jpeg.py) instead of reimplementing
        # entropy coding.
        if bps != 1 or planes != 1:
            raise NotImplementedError(
                "TIFF JPEG compression with 16-bit samples or planar "
                "configuration 2 is a plug-in point"
            )
        from .jpeg import _jpeg_decode

        tbl = bytes(fields.get(_T_JPEG_TABLES, []))
        body = b""
        if tbl:
            if len(tbl) < 4 or tbl[:2] != b"\xff\xd8":
                raise ValueError("TIFF JPEGTables is not a JPEG stream")
            body = tbl[2:-2] if tbl[-2:] == b"\xff\xd9" else tbl[2:]
        luma = np.zeros((height, width), dtype=np.uint8)
        for idx, (x0, y0, bc, br) in enumerate(geo):
            o, c = offsets[idx], counts[idx]
            if o + c > len(payload):
                raise ValueError(
                    "TIFF segment runs past the end of the file"
                )
            rows = min(br, height - y0)
            cols = min(bc, width - x0)
            s = payload[o : o + c]
            if s[:2] != b"\xff\xd8":
                raise ValueError(f"TIFF JPEG segment {idx} missing SOI")
            jw, jh, g = _jpeg_decode(s[:2] + body + s[2:])
            # segments may be padded up to MCU/tile multiples — crop,
            # never pad
            if jw < cols or jh < rows:
                raise ValueError(
                    f"TIFF JPEG segment {idx} decodes {jw}x{jh}, smaller "
                    f"than the declared {cols}x{rows}"
                )
            luma[y0 : y0 + rows, x0 : x0 + cols] = g[:rows, :cols]
        if photometric == 0:
            luma = (255 - luma).astype(np.uint8)
        return width, height, luma

    if bilevel and predictor == 2:
        raise ValueError(
            "TIFF predictor 2 is undefined for 1-bit samples"
        )
    sdtype = np.dtype(endian + ("u2" if bps == 2 else "u1"))
    img = np.zeros((height, width, spp), dtype=sdtype)
    seg_spp = 1 if planar == 2 else spp
    for idx in range(len(geo) * planes):
        o, c = offsets[idx], counts[idx]
        plane = idx // len(geo)
        x0, y0, bc, br = geo[idx % len(geo)]
        if o + c > len(payload):
            raise ValueError("TIFF segment runs past the end of the file")
        chunk = payload[o : o + c]
        if bilevel:
            # 1-bit rows pack MSB-first, each row byte-aligned (§ image
            # data layout); unpack to 0/255 so the luma contract and the
            # photometric-0 inversion apply unchanged
            rowbytes = (bc + 7) // 8
            expect = br * rowbytes
        else:
            expect = br * bc * seg_spp * bps
        if compression != 1:
            # each segment is its own stream; its output is hard-bounded
            # by the segment's OWN declared pixel bytes
            if compression == 5:
                chunk = _tiff_lzw_decode(chunk, expect)
            elif ccitt_mode is not None:
                # fax-coded segment: decode to packed rows; black packs
                # as 1 under photometric 0 (white-is-zero, the fax
                # default) and 0 under photometric 1, so the shared
                # unpack + inversion path below applies unchanged
                from .ccitt import ccitt_decode_packed

                chunk = ccitt_decode_packed(
                    chunk,
                    columns=bc,
                    rows=br,
                    mode=ccitt_mode,
                    byte_align=ccitt_mode == "mh",
                    black_bit=1 if photometric == 0 else 0,
                )
            else:
                chunk = _packbits_decode(chunk, expect)
        if len(chunk) < expect:
            raise ValueError(
                f"TIFF segment {idx} holds {len(chunk)} < {expect} bytes"
            )
        if bilevel:
            packed = np.frombuffer(chunk[:expect], dtype=np.uint8).reshape(
                br, rowbytes
            )
            a = (
                np.unpackbits(packed, axis=1)[:, :bc].astype(np.uint8)
                * np.uint8(255)
            )[:, :, None]
        else:
            a = np.frombuffer(chunk[:expect], dtype=sdtype).reshape(
                br, bc, seg_spp
            )
        if predictor == 2:
            # undo horizontal differencing: per SEGMENT row (a tile row
            # restarts at the tile's left edge), cumulative sum across
            # columns within each sample channel (mod 2^bits); native
            # byte order first — ufunc dtype args reject explicit-order
            # dtypes, and accumulate semantics don't depend on it
            native = np.uint16 if bps == 2 else np.uint8
            a = np.add.accumulate(
                a.astype(native), axis=1, dtype=native
            )
        rows = min(br, height - y0)
        cols = min(bc, width - x0)
        if planar == 2:
            img[y0 : y0 + rows, x0 : x0 + cols, plane] = a[:rows, :cols, 0]
        else:
            img[y0 : y0 + rows, x0 : x0 + cols, :] = a[:rows, :cols, :]
    if bps == 2:
        # 16-bit samples -> the 8-bit luma contract via the high byte
        img = (img >> 8).astype(np.uint8)
    if spp == 3:
        luma = (
            (
                77 * img[:, :, 0].astype(np.uint32)
                + 150 * img[:, :, 1].astype(np.uint32)
                + 29 * img[:, :, 2].astype(np.uint32)
            )
            >> 8
        ).astype(np.uint8)
    else:
        luma = img[:, :, 0].copy()
        if photometric == 0:  # min-is-white: invert to the luma convention
            luma = (255 - luma).astype(np.uint8)
    return width, height, luma


def _tiff_pages(payload: bytes) -> int:
    """Count IFDs (pages) by walking the chain — no pixel decode."""
    bom = payload[:2]
    endian = "<" if bom == b"II" else ">"
    _, off = struct.unpack_from(endian + "HI", payload, 2)
    pages = 0
    seen = set()
    while off and off not in seen:
        seen.add(off)
        _, off = _read_ifd(payload, off, endian)
        pages += 1
        if pages > 10_000:
            raise ValueError("TIFF IFD chain unreasonably long")
    return pages
