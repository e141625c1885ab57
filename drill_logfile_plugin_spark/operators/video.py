"""Motion-JPEG video decoder (AVI container, stdlib + numpy).

Real VIDEO bytes behind the multimodal dispatch with zero external
libraries: the AVI RIFF container is pure chunk arithmetic, and each
``00dc`` frame is a complete JPEG the package's own decoder
(:mod:`.jpeg`) already handles — so ``frame_sample(codec="avi")`` emits
genuinely decoded frames with real container-derived timestamps, not
md5-derived fakes.

Scope mirrors the other codecs: MJPG streams (each frame standalone
JPEG), the ``avih``-declared frame rate, the first video stream.
Compressed codecs that need inter-frame state (H.26x, VP9, AV1 — no
such decoder can be stdlib-grade) raise NotImplementedError at the
dispatch; malformed containers raise ValueError; header-derived counts
are bounded before allocation.

No reference counterpart (the reference plugin is text-only);
LLM-pipeline extension tier.
"""

from __future__ import annotations

import struct

#: frame-count bound — an avih header must not drive an unbounded loop
_AVI_MAX_FRAMES = 1 << 16


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
