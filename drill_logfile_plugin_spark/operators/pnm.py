"""NetPBM (PBM/PGM/PPM, P1-P6) decoder — stdlib + numpy only.

The interchange family academic and scanned-document corpora ship
alongside TIFF: P1/P4 bitmaps, P2/P5 graymaps, P3/P6 pixmaps, in both
the ASCII ("plain") and binary ("raw") encodings, at 8- or 16-bit
sample depth (maxval up to 65535, big-endian two-byte samples per the
spec). Decoded to the package's standard ``(width, height, luma)``
contract — a ``(height, width)`` uint8 array, BT.601 integer weights
``(77 R + 150 G + 29 B) >> 8`` for color, ``v * 255 // maxval`` scaling
for non-255 maxvals, PBM's 1-is-black mapped to luma 0 — so NetPBM
payloads drop into ``decode_media`` / ``extract_features`` /
``frame_sample`` / ``phash_signatures`` unchanged.

Header rules per the spec: tokens separated by arbitrary whitespace,
``#`` comments run to end of line anywhere in the header, EXACTLY one
whitespace byte separates the maxval (or dimensions, for P4) from the
binary raster; P4 rows pack MSB-first and pad to whole bytes per row.

Guards: dimension/maxval sanity and the pixel bomb bound run BEFORE any
allocation (untrusted input); truncated rasters and malformed tokens
raise ValueError; the PAM superset (P7) raises NotImplementedError — a
documented plug-in point.

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C); the
reference plugin has no media surface.
"""

from __future__ import annotations

#: dimension bomb guard, matching the PNG/GIF/BMP decoders' bound
_PNM_MAX_PIXELS = 64_000_000

_WS = b" \t\r\n\x0b\x0c"


def _tokens(payload: bytes, need: int, start: int):
    """Read ``need`` whitespace-separated numeric header tokens from
    ``start``, honoring ``#`` comments; returns (tokens, position right
    after the last token's final digit)."""
    toks = []
    pos = start
    n = len(payload)
    while len(toks) < need:
        while pos < n and (payload[pos] in _WS or payload[pos] == 0x23):
            if payload[pos] == 0x23:  # '#' comment to end of line
                nl = payload.find(b"\n", pos)
                if nl == -1:
                    raise ValueError("PNM header comment runs past end of file")
                pos = nl + 1
            else:
                pos += 1
        tok = bytearray()
        while pos < n and payload[pos] not in _WS and payload[pos] != 0x23:
            tok.append(payload[pos])
            pos += 1
        if not tok:
            raise ValueError("PNM header truncated")
        if not tok.isdigit():
            raise ValueError(f"PNM header token {bytes(tok)!r} is not a number")
        toks.append(int(tok))
    return toks, pos


def _ascii_samples(payload: bytes, start: int, count: int, np):
    body = payload[start:]
    # comments are legal between plain-format samples too
    if b"#" in body:
        lines = body.split(b"\n")
        body = b"\n".join(ln.split(b"#", 1)[0] for ln in lines)
    parts = body.split()
    if len(parts) < count:
        raise ValueError(
            f"PNM plain raster truncated: need {count} samples, have {len(parts)}"
        )
    try:
        arr = np.array([int(p) for p in parts[:count]], dtype=np.int64)
    except ValueError as exc:
        raise ValueError(f"PNM plain raster has a non-numeric sample: {exc}")
    return arr


def _pnm_decode(payload: bytes):
    """Decode a NetPBM image to ``(width, height, luma)`` with luma a
    ``(height, width)`` uint8 numpy array (BT.601 integer weights,
    the _png_decode convention)."""
    import numpy as np

    if len(payload) < 2 or payload[0:1] != b"P":
        raise ValueError("not a PNM (missing P magic)")
    kind = payload[1:2]
    if kind == b"7":
        raise NotImplementedError(
            "PAM (P7) is a plug-in point; PBM/PGM/PPM P1-P6 are supported"
        )
    if kind not in b"123456":
        raise ValueError(f"not a PNM (magic P{payload[1:2].decode('ascii', 'replace')})")
    kind = int(kind)
    bitmap = kind in (1, 4)
    channels = 3 if kind in (3, 6) else 1
    plain = kind <= 3

    need = 2 if bitmap else 3
    toks, pos = _tokens(payload, need, 2)
    if not plain:
        # binary rasters begin after EXACTLY one whitespace byte
        if pos >= len(payload) or payload[pos] not in _WS:
            raise ValueError("PNM raw raster must follow one whitespace byte")
        pos += 1
    if bitmap:
        width, height = toks
        maxval = 1
    else:
        width, height, maxval = toks
    if width <= 0 or height <= 0:
        raise ValueError(f"PNM with invalid dimensions {width}x{height}")
    if width * height > _PNM_MAX_PIXELS:
        raise ValueError(
            f"PNM dimensions {width}x{height} exceed the decoder bound"
        )
    if not bitmap and not 1 <= maxval <= 65535:
        raise ValueError(f"PNM maxval {maxval} out of the spec range [1, 65535]")

    n_samples = width * height * channels
    if kind == 4:
        stride = (width + 7) // 8
        raster = payload[pos : pos + stride * height]
        if len(raster) != stride * height:
            raise ValueError("PNM raw raster truncated")
        bits = np.unpackbits(
            np.frombuffer(raster, dtype=np.uint8).reshape(height, stride), axis=1
        )[:, :width]
        return width, height, np.where(bits == 1, 0, 255).astype(np.uint8)
    if kind == 1:
        vals = _ascii_samples(payload, pos, n_samples, np)
        if vals.max(initial=0) > 1:
            raise ValueError("PBM plain raster sample exceeds 1")
        bits = vals.reshape(height, width)
        return width, height, np.where(bits == 1, 0, 255).astype(np.uint8)

    if plain:
        vals = _ascii_samples(payload, pos, n_samples, np)
    else:
        two_byte = maxval > 255
        nbytes = n_samples * (2 if two_byte else 1)
        raster = payload[pos : pos + nbytes]
        if len(raster) != nbytes:
            raise ValueError("PNM raw raster truncated")
        vals = np.frombuffer(
            raster, dtype=">u2" if two_byte else np.uint8
        ).astype(np.int64)
    if vals.max(initial=0) > maxval:
        raise ValueError("PNM sample exceeds the declared maxval")
    scaled = (vals * 255) // maxval  # exact integer scaling, deterministic
    if channels == 1:
        return width, height, scaled.reshape(height, width).astype(np.uint8)
    px = scaled.reshape(height, width, 3).astype(np.uint32)
    luma = ((77 * px[:, :, 0] + 150 * px[:, :, 1] + 29 * px[:, :, 2]) >> 8).astype(
        np.uint8
    )
    return width, height, luma
