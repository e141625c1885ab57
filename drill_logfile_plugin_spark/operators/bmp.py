"""BMP (Windows bitmap) decoder — stdlib + numpy, no external libraries.

The simplest real image container a crawl serves (uncompressed DIBs are
still common as scanned-document and screenshot payloads): a 14-byte file
header, a BITMAPINFOHEADER, an optional palette, and rows of raw pixels
padded to 4 bytes, bottom-up unless the height is negative. Decoded to
the package's standard ``(width, height, luma)`` contract — the BT.601
integer luma plane every other image codec here emits — so BMP drops into
``decode_media`` / ``extract_features`` / ``frame_sample`` /
``phash_signatures`` unchanged.

Supported profiles: BI_RGB (uncompressed) at 24-bit BGR, 32-bit BGRx,
8-bit, 4-bit, and 1-bit palettized (MSB-first); BI_RLE8 and BI_RLE4
run-length streams (encoded/absolute/delta/end-of-line/end-of-bitmap
modes per the spec, with every cursor write bounds-checked — an RLE
stream is attacker-controlled cursor arithmetic); both bottom-up and
top-down row orders (RLE is bottom-up by spec); BITMAPINFOHEADER and
the larger V4/V5 headers (the extra fields don't affect these layouts).
OS/2 BITMAPCOREHEADER files (12-byte header, 16-bit dims, packed BGR
palette triples) decode too. Bitfields and embedded JPEG/PNG raise
NotImplementedError — explicit plug-in points, the JPEG-tier
convention. Dimension and size sanity run BEFORE any
allocation: headers are untrusted input (the PNG bomb-guard rule).

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C); the
reference plugin has no media surface.
"""

from __future__ import annotations

import struct

#: dimension bomb guard, matching the PNG/GIF decoders' bound
_BMP_MAX_PIXELS = 64_000_000


def _bmp_rle_decode(stream: bytes, width: int, height: int, rle4: bool):
    """Decode a BI_RLE8/BI_RLE4 pixel stream to an (height, width) uint8
    index array in FILE row order (row 0 = bottom; the caller flips).

    Per the format spec: encoded pairs ``(count>0, value)`` repeat the
    index (RLE8) or the two alternating nibble indexes (RLE4); escape
    pairs ``(0, 0)`` end the line, ``(0, 1)`` ends the bitmap, ``(0, 2)``
    jumps the cursor by (dx, dy), and ``(0, n>=3)`` runs absolute mode —
    n literal indexes (bytes or packed nibbles) padded to a 16-bit
    boundary. Undecoded cells stay index 0, matching the usual
    renderers. Any write outside (width, height) raises — an RLE stream
    is attacker-supplied cursor arithmetic (untrusted input)."""
    import numpy as np

    idx = np.zeros((height, width), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(stream)

    def put(run):
        nonlocal x
        if y >= height or x + len(run) > width:
            raise ValueError("BMP RLE run writes outside the bitmap")
        idx[y, x : x + len(run)] = run
        x += len(run)

    while True:
        if pos + 2 > n:
            raise ValueError("BMP RLE stream truncated (no end-of-bitmap)")
        count, val = stream[pos], stream[pos + 1]
        pos += 2
        if count > 0:
            if rle4:
                pair = [val >> 4, val & 0x0F]
                put([pair[i & 1] for i in range(count)])
            else:
                put([val] * count)
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # cursor delta
            if pos + 2 > n:
                raise ValueError("BMP RLE delta truncated")
            dx, dy = stream[pos], stream[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > width or y > height:
                raise ValueError("BMP RLE delta jumps outside the bitmap")
        else:  # absolute mode: val literal pixels
            if rle4:
                nbytes = (val + 1) // 2
                chunk = stream[pos : pos + nbytes]
                if len(chunk) != nbytes:
                    raise ValueError("BMP RLE absolute run truncated")
                nibs = []
                for b in chunk:
                    nibs += [b >> 4, b & 0x0F]
                put(nibs[:val])
            else:
                chunk = stream[pos : pos + val]
                if len(chunk) != val:
                    raise ValueError("BMP RLE absolute run truncated")
                put(list(chunk))
                nbytes = val
            pos += nbytes + (nbytes & 1)  # pad to 16-bit boundary


def _bmp_decode(payload: bytes):
    """Decode a BMP to ``(width, height, luma)`` with luma a
    ``(height, width)`` uint8 numpy array (BT.601 integer weights,
    the _png_decode convention)."""
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP (bad signature or truncated header)")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    core = hdr_size == 12  # OS/2 BITMAPCOREHEADER
    if core:
        # 16-bit dims, no compression field, 3-byte palette entries,
        # always bottom-up
        width, height_raw = struct.unpack("<hh", payload[18:22])
        planes, bpp = struct.unpack("<HH", payload[22:26])
        compression = 0
    elif hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size}: only BITMAPCOREHEADER (12) and "
            "BITMAPINFOHEADER+ (>= 40) layouts exist in the wild"
        )
    else:
        width, height_raw = struct.unpack("<ii", payload[18:26])
        planes, bpp = struct.unpack("<HH", payload[26:30])
        compression = struct.unpack("<I", payload[30:34])[0]
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height == 0:
        raise ValueError(f"BMP with invalid dimensions {width}x{height_raw}")
    if width * height > _BMP_MAX_PIXELS:
        raise ValueError(
            f"BMP dimensions {width}x{height} exceed the decoder bound"
        )
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if compression == 1 and bpp != 8:
        raise ValueError("BMP BI_RLE8 requires 8 bits per pixel")
    if compression == 2 and bpp != 4:
        raise ValueError("BMP BI_RLE4 requires 4 bits per pixel")
    if compression in (1, 2) and top_down:
        raise ValueError("BMP RLE streams must be bottom-up (positive height)")
    if compression not in (0, 1, 2):
        raise NotImplementedError(
            f"BMP compression {compression}: bitfields/JPEG/PNG embeddings "
            "are plug-in points; BI_RGB and RLE4/RLE8 are supported"
        )
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(
            f"BMP bit depth {bpp}: 1/4/8/24/32 supported; 16-bit "
            "bitfields are a plug-in point"
        )

    if bpp in (1, 4, 8):
        if core:
            n_colors = 1 << bpp  # no biClrUsed field in the core header
        else:
            n_colors = struct.unpack("<I", payload[46:50])[0] or (1 << bpp)
        entry = 3 if core else 4  # core palettes are packed BGR triples
        pal_off = 14 + hdr_size
        pal_end = pal_off + entry * n_colors
        if pal_end > len(payload):
            raise ValueError("BMP palette truncated")
        pal = np.frombuffer(
            payload[pal_off:pal_end], dtype=np.uint8
        ).reshape(n_colors, entry)
        # palette entries are BGRx; BT.601 integer luma per entry
        pal_luma = (
            (
                77 * pal[:, 2].astype(np.uint32)
                + 150 * pal[:, 1].astype(np.uint32)
                + 29 * pal[:, 0].astype(np.uint32)
            )
            >> 8
        ).astype(np.uint8)

    if compression in (1, 2):
        idx = _bmp_rle_decode(
            payload[data_offset:], width, height, rle4=(compression == 2)
        )
        if int(idx.max(initial=0)) >= len(pal_luma):
            raise ValueError("BMP palette index out of range")
        return width, height, np.ascontiguousarray(pal_luma[idx][::-1])

    row_bits = width * bpp
    stride = ((row_bits + 31) // 32) * 4  # rows pad to 4 bytes
    need = data_offset + stride * height
    if need > len(payload):
        raise ValueError(
            f"BMP pixel data truncated: need {need} bytes, have "
            f"{len(payload)}"
        )
    raw = np.frombuffer(
        payload[data_offset : data_offset + stride * height], dtype=np.uint8
    ).reshape(height, stride)
    if bpp == 24:
        px = raw[:, : width * 3].reshape(height, width, 3)
        luma = (
            (
                77 * px[:, :, 2].astype(np.uint32)
                + 150 * px[:, :, 1].astype(np.uint32)
                + 29 * px[:, :, 0].astype(np.uint32)
            )
            >> 8
        ).astype(np.uint8)
    elif bpp == 32:
        px = raw[:, : width * 4].reshape(height, width, 4)
        luma = (
            (
                77 * px[:, :, 2].astype(np.uint32)
                + 150 * px[:, :, 1].astype(np.uint32)
                + 29 * px[:, :, 0].astype(np.uint32)
            )
            >> 8
        ).astype(np.uint8)
    elif bpp == 8:
        idx = raw[:, :width]
        if int(idx.max(initial=0)) >= len(pal_luma):
            raise ValueError("BMP palette index out of range")
        luma = pal_luma[idx]
    elif bpp == 4:
        # high nibble first within each byte
        nibs = np.empty((height, raw.shape[1] * 2), dtype=np.uint8)
        nibs[:, 0::2] = raw >> 4
        nibs[:, 1::2] = raw & 0x0F
        idx = nibs[:, :width]
        if int(idx.max(initial=0)) >= len(pal_luma):
            raise ValueError("BMP palette index out of range")
        luma = pal_luma[idx]
    else:  # bpp == 1, MSB-first
        bits = np.unpackbits(raw, axis=1)[:, :width]
        luma = pal_luma[bits] if len(pal_luma) >= 2 else pal_luma[
            np.zeros_like(bits)
        ]
    if not top_down:
        luma = luma[::-1]
    return width, height, np.ascontiguousarray(luma)
