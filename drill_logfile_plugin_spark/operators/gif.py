"""GIF decoder (stdlib + numpy) for the multimodal tier.

The third real image container, and the second real ANIMATION source:
GIF87a/89a header parse, logical screen descriptor, global/local color
tables, LZW decompression (variable-width codes, clear/EOI, the
spec's grow-at-2^codesize rule, 12-bit cap), 4-pass row interlacing,
and multi-frame animations with graphic-control delays — so
``frame_sample(codec="gif")`` emits real frames with real delays.

Scope: ``_gif_decode`` yields each frame's OWN indexed sub-image
(left/top/width/height rectangle) as luma plus its disposal method and
transparency mask; ``_gif_composite_frames`` (r9) plays the full
disposal chain — none/keep, restore-to-background, restore-to-previous,
with transparency showing the underlying screen through — so sampled
frames of partial-update animations are COMPLETE images before they hit
the phash/fingerprint lanes. The frame-0 feature lane
(``_gif_first_frame_screen``) keeps its compositing-free zero-background
view.

Guards as elsewhere in the tier: malformed bytes raise ValueError,
dimension/LZW output bounds precede allocation, absent capabilities
raise NotImplementedError. Verified in pytest against an independent
in-test GIF writer whose LZW compressor mirrors the spec's decoder
synchronization (plus a raw LZW round-trip property).

No reference counterpart; LLM-pipeline extension tier.
"""

from __future__ import annotations

import struct

#: same pixel bound as the PNG/JPEG decoders — headers are untrusted
_GIF_MAX_PIXELS = 1 << 26
_GIF_MAX_FRAMES = 1 << 12

#: GIF interlace passes: (row offset, row step), spec appendix E
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR resets the
    table, width grows when the table reaches 2^width (capped at 12
    bits). ``max_out`` bounds output — a crafted stream cannot
    out-allocate the image it claims to be."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("GIF LZW minimum code size out of range")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    table: list[bytes] = []
    code_size = 0
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW code out of sequence")
        out += entry
        if len(out) > max_out:
            raise ValueError("GIF LZW output exceeds declared image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block sequence; returns (data, next_pos)."""
    out = bytearray()
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF sub-blocks truncated")
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("GIF sub-block overruns payload")
        out += payload[pos : pos + size]
        pos += size


def _gif_decode(payload: bytes):
    """Decode a GIF to ``(width, height, frames)`` — logical screen dims
    plus one dict per image frame:
    ``{"x", "y", "w", "h", "luma" (h, w) uint8, "delay_ms"}`` in stream
    order (a still GIF is one frame with delay 0)."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    width, height, flags, _bg, _ar = struct.unpack(
        "<HHBBB", payload[6:13]
    )
    if width == 0 or height == 0:
        raise ValueError("GIF with zero logical screen dimension")
    if width * height > _GIF_MAX_PIXELS:
        raise ValueError(
            f"GIF dimensions {width}x{height} exceed the decoder bound"
        )
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n

    frames: list[dict] = []
    delay_ms = 0
    disposal = 0
    trans_idx = None
    n_total = len(payload)
    while True:
        if pos >= n_total:
            raise ValueError("GIF truncated before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n_total:
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                (delay_cs,) = struct.unpack("<H", data[1:3])
                delay_ms = delay_cs * 10
                disposal = (data[0] >> 2) & 0x07
                trans_idx = data[3] if data[0] & 0x01 else None
        elif block == 0x2C:  # image descriptor
            if pos + 9 > n_total:
                raise ValueError("GIF image descriptor truncated")
            x, y, w, h, iflags = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            if w == 0 or h == 0 or w * h > _GIF_MAX_PIXELS:
                raise ValueError("GIF frame dimensions invalid")
            if len(frames) >= _GIF_MAX_FRAMES:
                raise ValueError("GIF frame count exceeds the decoder bound")
            palette = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                if len(palette) != n:
                    raise ValueError("GIF local color table truncated")
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF frame has no color table")
            if pos >= n_total:
                raise ValueError("GIF image data truncated")
            min_code = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            idx = np.frombuffer(
                _lzw_decode(data, min_code, w * h), dtype=np.uint8
            )
            if idx.size != w * h:
                raise ValueError("GIF frame pixel count mismatch")
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("GIF pixel index outside color table")
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: reorder the 4 passes
                ordered = np.zeros_like(grid)
                src = 0
                for off, step in _GIF_INTERLACE:
                    rows = range(off, h, step)
                    for r in rows:
                        ordered[r] = grid[src]
                        src += 1
                grid = ordered
            mask = None
            if trans_idx is not None and trans_idx < len(palette):
                mask = grid == trans_idx
            rgb = palette[grid].astype(np.int64)
            luma = (
                rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114
            ) // 1000
            frames.append(
                {
                    "x": x,
                    "y": y,
                    "w": w,
                    "h": h,
                    "luma": luma.astype(np.uint8),
                    "delay_ms": delay_ms,
                    "disposal": disposal,
                    "mask": mask,
                }
            )
            # graphic control applies to ONE image
            delay_ms = 0
            disposal = 0
            trans_idx = None
        else:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return int(width), int(height), frames


def _gif_first_frame_screen(payload: bytes):
    """Frame 0 rendered onto the logical screen (zero-filled outside the
    frame rectangle) — the compositing-free feature-lane view."""
    import numpy as np

    w, h, frames = _gif_decode(payload)
    screen = np.zeros((h, w), dtype=np.uint8)
    f = frames[0]
    y2 = min(h, f["y"] + f["h"])
    x2 = min(w, f["x"] + f["w"])
    screen[f["y"] : y2, f["x"] : x2] = f["luma"][
        : y2 - f["y"], : x2 - f["x"]
    ]
    return w, h, screen


def _gif_composite_frames(payload: bytes):
    """Full animation compositing (r9): ``(width, height,
    [(screen_luma, delay_ms), ...])`` with each output frame the
    COMPLETE logical screen after drawing frame N per the GIF89a
    disposal chain — partial-update animations (the normal encoder
    output) yield whole images instead of update rectangles, which is
    what the phash/fingerprint lanes need to see.

    Disposal methods: 0/1 leave the screen as drawn; 2 clears the
    frame's rectangle back to the background color before the next
    frame; 3 restores the screen to its pre-frame state. Transparent
    pixels (graphic-control transparency index) let the underlying
    screen show through — the mechanism partial updates rely on."""
    import numpy as np

    w, h, frames = _gif_decode(payload)
    flags = payload[10]
    bg_idx = payload[11]
    bg_luma = 0
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload[13 : 13 + 3 * n], dtype=np.uint8
        ).reshape(-1, 3).astype(np.int64)
        if bg_idx < n:
            r, g, b = gct[bg_idx]
            bg_luma = int((r * 299 + g * 587 + b * 114) // 1000)
    screen = np.full((h, w), bg_luma, dtype=np.uint8)
    out = []
    for f in frames:
        y2 = min(h, f["y"] + f["h"])
        x2 = min(w, f["x"] + f["w"])
        prev = screen.copy() if f["disposal"] == 3 else None
        region = screen[f["y"] : y2, f["x"] : x2]
        luma = f["luma"][: y2 - f["y"], : x2 - f["x"]]
        if f["mask"] is not None:
            m = f["mask"][: y2 - f["y"], : x2 - f["x"]]
            region[~m] = luma[~m]
        else:
            region[:] = luma
        out.append((screen.copy(), f["delay_ms"]))
        if f["disposal"] == 2:
            screen[f["y"] : y2, f["x"] : x2] = bg_luma
        elif f["disposal"] == 3:
            screen = prev
    return w, h, out
