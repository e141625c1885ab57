"""Video decoders (MJPEG-AVI and YUV4MPEG2, stdlib + numpy).

Real VIDEO bytes behind the multimodal dispatch with zero external
libraries:

* **MJPEG AVI** — the RIFF container is pure chunk arithmetic, and each
  ``00dc`` frame is a complete JPEG the package's own decoder
  (:mod:`.jpeg`) already handles — so ``frame_sample(codec="avi")``
  emits genuinely decoded frames with real container-derived
  timestamps, not md5-derived fakes.
* **Y4M (YUV4MPEG2)** — the uncompressed interchange format every
  video toolchain (ffmpeg, x264/5 test suites, codec research corpora)
  reads and writes: a one-line ASCII header (``W H F<num>:<den> I A
  C<chroma>``), then ``FRAME\\n``-delimited raw planar YUV. The Y plane
  IS the BT.601 luma plane, so Y4M frames feed the luma-histogram /
  aHash lanes with no color conversion at all. Supported chroma
  modes: C420 (+jpeg/paldv/mpeg2 siting variants — same byte layout),
  C422, C444, Cmono; frame timestamps derive from the header's exact
  rational frame rate.

Scope mirrors the other codecs: compressed codecs that need
inter-frame state (H.26x, VP9, AV1 — no such decoder can be
stdlib-grade) raise NotImplementedError at the dispatch; malformed
containers raise ValueError; header-derived counts are bounded before
allocation.

No reference counterpart (the reference plugin is text-only);
LLM-pipeline extension tier.
"""

from __future__ import annotations

import struct

#: frame-count bound — an avih header must not drive an unbounded loop
_AVI_MAX_FRAMES = 1 << 16

#: Y4M guards: per-frame pixel bound (the image codecs' bound) and the
#: same frame-count bound as AVI
_Y4M_MAX_PIXELS = 64_000_000


def _riff_chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        data_start = pos + 8
        if data_start + size > end:
            raise ValueError("truncated AVI chunk")
        yield cid, data_start, size
        pos = data_start + size + (size & 1)


def _avi_decode(payload: bytes):
    """Parse an MJPEG AVI: returns
    ``(width, height, us_per_frame, frames)`` — ``frames`` the list of
    per-frame JPEG byte strings (video stream chunks ``NNdc``/``NNdb``).
    Dimensions come from decoding frame 0 (the container's avih values
    are advisory and frequently wrong in the wild; the bitstream is the
    truth)."""
    from .jpeg import _jpeg_decode

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not an AVI (missing RIFF/AVI header)")

    us_per_frame = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame
        for cid, dstart, size in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                # list type occupies the first 4 payload bytes
                walk(dstart + 4, dstart + size)
            elif cid == b"avih":
                if size < 4:
                    raise ValueError("AVI avih chunk truncated")
                (us_per_frame,) = struct.unpack(
                    "<I", payload[dstart : dstart + 4]
                )
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                if len(frames) >= _AVI_MAX_FRAMES:
                    raise ValueError(
                        f"AVI frame count exceeds the decoder bound "
                        f"({_AVI_MAX_FRAMES})"
                    )
                frames.append(payload[dstart : dstart + size])

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI contains no video frames")
    if not frames[0][:2] == b"\xff\xd8":
        raise NotImplementedError(
            "AVI video stream is not MJPG (per-frame JPEG); inter-frame "
            "codecs are not decodable without external libraries"
        )
    w, h, _gray = _jpeg_decode(frames[0])
    return w, h, int(us_per_frame or 40000), frames


def _avi_frame_luma(payload: bytes, frame_idx: int):
    """Decode one sampled frame's luma — the per-frame feature hook."""
    from .jpeg import _jpeg_decode

    _w, _h, _us, frames = _avi_decode(payload)
    return _jpeg_decode(frames[frame_idx])[2]


# --- YUV4MPEG2 ----------------------------------------------------------------

#: bytes per frame for each supported chroma mode, as a function of the
#: luma plane size (420: Y + 2 quarter planes; 422: Y + 2 half planes)
_Y4M_CHROMA = {
    "420": 6,       # sixths: frame = y_size * 6 // 4
    "420jpeg": 6,
    "420paldv": 6,
    "420mpeg2": 6,
    "422": 8,       # frame = y_size * 8 // 4
    "444": 12,      # frame = y_size * 12 // 4
    "mono": 4,      # frame = y_size
}


def _y4m_decode(payload: bytes):
    """Parse a YUV4MPEG2 stream: returns
    ``(width, height, us_per_frame, frames)`` — ``frames`` the list of
    per-frame raw planar byte strings (Y plane first). Header parameters
    follow the published spec: space-separated tagged fields after the
    ``YUV4MPEG2`` magic, ``X``-prefixed extensions ignored, chroma
    defaulting to 420jpeg when no ``C`` tag is present."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream (missing YUV4MPEG2 magic)")
    nl = payload.find(b"\n")
    if nl == -1:
        raise ValueError("Y4M stream header unterminated")
    width = height = None
    fps_num, fps_den = 25, 1
    chroma = "420jpeg"
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        try:
            if key == b"W":
                width = int(val)
            elif key == b"H":
                height = int(val)
            elif key == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif key == b"C":
                chroma = val.decode("ascii")
            # I (interlacing), A (aspect), X (extensions): layout-neutral
        except (ValueError, UnicodeDecodeError):
            raise ValueError(f"Y4M header tag {tag!r} malformed")
    if width is None or height is None or width <= 0 or height <= 0:
        raise ValueError("Y4M header missing or invalid W/H")
    if width * height > _Y4M_MAX_PIXELS:
        raise ValueError(
            f"Y4M dimensions {width}x{height} exceed the decoder bound"
        )
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("Y4M frame rate must be a positive rational")
    if chroma not in _Y4M_CHROMA:
        raise NotImplementedError(
            f"Y4M chroma mode C{chroma} not supported "
            f"(supported: {sorted(_Y4M_CHROMA)})"
        )
    if chroma.startswith("42") and (width % 2 or (chroma.startswith("420") and height % 2)):
        raise ValueError(
            f"Y4M C{chroma} requires even subsampled dimensions, got "
            f"{width}x{height}"
        )
    y_size = width * height
    frame_size = y_size * _Y4M_CHROMA[chroma] // 4
    us_per_frame = (1_000_000 * fps_den) // fps_num

    frames: list[bytes] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl == -1 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame header malformed or truncated")
        # frame headers may carry their own tagged parameters; layout-
        # changing per-frame tags are not in the wild — ignored like X
        fstart = fnl + 1
        if fstart + frame_size > n:
            raise ValueError("Y4M frame data truncated")
        if len(frames) >= _AVI_MAX_FRAMES:
            raise ValueError(
                f"Y4M frame count exceeds the decoder bound ({_AVI_MAX_FRAMES})"
            )
        frames.append(payload[fstart : fstart + frame_size])
        pos = fstart + frame_size
    if not frames:
        raise ValueError("Y4M stream contains no frames")
    return width, height, us_per_frame, frames


def _y4m_frame_luma(payload: bytes, frame_idx: int):
    """One frame's Y plane as an (h, w) uint8 array — in Y4M the Y plane
    IS the luma, no conversion."""
    import numpy as np

    w, h, _us, frames = _y4m_decode(payload)
    return np.frombuffer(frames[frame_idx][: w * h], dtype=np.uint8).reshape(h, w)
