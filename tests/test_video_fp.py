"""Video sequence fingerprinting: the same frames re-muxed as AVI and
Y4M match at offset 0 (cross-container), a trimmed copy matches WITH
its trim offset, unrelated videos don't match, and subsampling keeps
offsets consistent."""

from __future__ import annotations

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators import video_fp as VF

from tests.test_audio_video_codec import write_avi
from tests.test_jpeg_codec import _Q50, encode_jpeg
from tests.test_y4m_codec import write_y4m


def _planes(seed: int, n: int, h=16, w=16):
    """Structured frames (block patterns) so aHashes are stable across
    the JPEG round-trip — random noise would not survive lossy DCT."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        base = np.zeros((h, w), dtype=np.uint8)
        # a few solid rectangles per frame
        for _k in range(3):
            y0, x0 = rng.integers(0, h - 4), rng.integers(0, w - 4)
            base[y0 : y0 + 4, x0 : x0 + 4] = rng.integers(100, 256)
        out.append(base)
    return out


def _avi(planes):
    frames = [
        encode_jpeg({1: p}, p.shape[1], p.shape[0], {1: (1, 1)}, _Q50)[0]
        for p in planes
    ]
    return write_avi(frames, planes[0].shape[1], planes[0].shape[0], 40000)


def test_cross_container_match_and_negative(spark):
    planes = _planes(1, 20)
    rows = [
        (0, bytearray(_avi(planes))),
        (1, bytearray(write_y4m(planes, chroma="mono"))),
        (2, bytearray(write_y4m(_planes(9, 20), chroma="mono"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = VF.frame_signatures(df.where("doc_id = 0"), codec="avi").unionByName(
        VF.frame_signatures(df.where("doc_id >= 1"), codec="y4m")
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in VF.video_near_dup(fps, min_votes=8).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["offset_frames"] == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_trimmed_copy_matches_with_offset(spark):
    planes = _planes(2, 24)
    full = write_y4m(planes, chroma="mono")
    trimmed = write_y4m(planes[6:], chroma="mono")  # first 6 frames cut
    df = spark.createDataFrame(
        [(0, bytearray(full)), (1, bytearray(trimmed))],
        "doc_id long, payload binary",
    )
    out = VF.video_near_dup(
        VF.frame_signatures(df, codec="y4m"), min_votes=8
    ).collect()
    assert len(out) == 1
    assert out[0]["offset_frames"] == 6  # full runs 6 frames behind the cut


def test_subsampling_keeps_offsets(spark):
    planes = _planes(3, 30)
    df = spark.createDataFrame(
        [(0, bytearray(write_y4m(planes, chroma="mono"))),
         (1, bytearray(write_y4m(planes, chroma="mono")))],
        "doc_id long, payload binary",
    )
    fps = VF.frame_signatures(df, codec="y4m", every_n=3)
    out = VF.video_near_dup(fps, min_votes=5).collect()
    assert len(out) == 1 and out[0]["offset_frames"] == 0


def test_setup_errors(spark):
    df = spark.createDataFrame([(0, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(NotImplementedError, match="codec"):
        VF.frame_signatures(df, codec="mp4")
    with pytest.raises(ValueError, match="every_n"):
        VF.frame_signatures(df, every_n=0)


def test_max_postings_drops_black_frame_hot_hashes(spark):
    """The video tier's degenerate content is black/static frames: every
    video sharing leading black frames 'matches' every other at the
    black-run offset. Capping postings drops those bands; the true pair
    (shared content frames) survives."""
    black = [np.zeros((16, 16), dtype=np.uint8)] * 10
    shared = _planes(4, 12)
    rows = [
        (0, bytearray(write_y4m(black + shared, chroma="mono"))),
        (1, bytearray(write_y4m(black + shared, chroma="mono"))),
        (2, bytearray(write_y4m(black + _planes(30, 12), chroma="mono"))),
        (3, bytearray(write_y4m(black + _planes(31, 12), chroma="mono"))),
        (4, bytearray(write_y4m(black + _planes(32, 12), chroma="mono"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = VF.frame_signatures(df, codec="y4m").cache()
    try:
        raw = {
            (r["doc_a"], r["doc_b"])
            for r in VF.video_near_dup(fps, min_votes=20).collect()
        }
        assert (0, 2) in raw  # black frames fake a match without the cap
        capped = {
            (r["doc_a"], r["doc_b"]): r["offset_frames"]
            for r in VF.video_near_dup(
                fps, min_votes=20, max_postings=16
            ).collect()
        }
        assert capped == {(0, 1): 0}
    finally:
        fps.unpersist()
