"""Video sequence fingerprinting: per-frame perceptual hashes + the
offset-consistency vote — content-level video near-dup.

The same recording ships re-muxed (MJPEG-AVI in one dump, Y4M in
another), re-encoded, or trimmed; byte hashing sees nothing. Frame
CONTENT does: every decoded frame's 64-bit aHash
(:func:`..operators.multimodal._ahash64_luma`) is a sequence element.
Lossy re-encodes flip a few aHash bits (measured: <= 7/64 across a
JPEG round-trip), so each frame emits its hash as FOUR 16-bit BANDS
(the SimHash pigeonhole: <= 3 flipped bands leave at least one
intact; position rides the key so bands only match like-for-like) —
and two videos sharing a run of frames agree on ONE index offset, so
matching REUSES :func:`..operators.audio_fp.audio_near_dup` verbatim
(an equi join on the banded key + the (pair, offset) vote; LSH
economics, never all-pairs). An intact frame contributes 4 agreeing
votes, a re-encoded frame usually >= 1 — calibrate ``min_votes`` in
frame-quarters.

``frame_signatures`` emits ``(doc_id, fp_hash, t_frame)`` — the same
schema the audio fingerprinter produces, which is the point: ONE
matching engine serves both modalities.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audio_fp import FINGERPRINT_SCHEMA, audio_near_dup


def frame_signatures(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "avi",
    every_n: int = 1,
    on_error: str = "skip",
) -> DataFrame:
    """Video payloads -> FOUR banded aHash rows per (sampled) frame:
    ``(doc_id, fp_hash, t_frame)`` with ``fp_hash = band_idx << 16 |
    band16`` (see module doc). ``codec``: "avi" (each frame JPEG-
    decoded), "y4m" (raw Y planes), or "gif" (r9: frames COMPOSITED
    through the disposal chain, so partial-update animations hash as
    the complete images a viewer sees, not update rectangles).
    ``every_n`` subsamples frames — matching still works because
    offsets stay consistent under uniform sampling (the vote just
    shrinks proportionally)."""
    import pandas as pd

    from .multimodal import _ahash64_luma, _check_on_error

    if codec not in ("avi", "y4m", "gif"):
        raise NotImplementedError(
            f"frame_signatures codec {codec!r}: avi, y4m, and gif are "
            "the decodable video/animation containers"
        )
    _check_on_error(on_error, allowed=("skip", "strict"))
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it):
        import numpy as np

        from .video import _avi_decode, _y4m_decode

        for pdf in it:
            ids, hashes, ts = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                try:
                    if codec == "avi":
                        from .jpeg import _jpeg_decode

                        _w, _h, _us, frames = _avi_decode(raw)
                        lumas = (
                            (i, _jpeg_decode(frames[i])[2])
                            for i in range(0, len(frames), every_n)
                        )
                    elif codec == "gif":
                        from .gif import _gif_composite_frames

                        _w, _h, screens = _gif_composite_frames(raw)
                        lumas = (
                            (i, screens[i][0])
                            for i in range(0, len(screens), every_n)
                        )
                    else:
                        w, h, _us, frames = _y4m_decode(raw)
                        lumas = (
                            (
                                i,
                                np.frombuffer(
                                    frames[i][: w * h], dtype=np.uint8
                                ).reshape(h, w),
                            )
                            for i in range(0, len(frames), every_n)
                        )
                    sigs = [(i, _ahash64_luma(l)) for i, l in lumas]
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    continue
                for i, sig in sigs:
                    for band in range(4):
                        ids.append(doc_id)
                        hashes.append(
                            (band << 16) | ((sig >> (16 * band)) & 0xFFFF)
                        )
                        ts.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fp_hash": pd.Series(hashes, dtype="int64"),
                    "t_frame": pd.Series(ts, dtype="int32"),
                }
            )

    return narrow.mapInPandas(batches, FINGERPRINT_SCHEMA)


def video_near_dup(
    fingerprints: DataFrame,
    min_votes: int = 16,
    max_postings: int | None = None,
) -> DataFrame:
    """Near-duplicate video pairs: the audio offset-vote engine over
    banded frame signatures (see
    :func:`..operators.audio_fp.audio_near_dup`). ``min_votes`` counts
    agreeing (band, frame) pairs at the best offset — an intact frame
    contributes 4, a lossy re-encode usually >= 1, so 16 votes ≈ four
    intact frames or a dozen re-encoded ones. ``max_postings`` caps the
    per-hash posting list before the join (black/static frames are the
    video tier's degenerate hot hashes — see the audio engine's doc)."""
    return audio_near_dup(
        fingerprints, min_votes=min_votes, max_postings=max_postings
    )
