"""Audio landmark fingerprinting: transcode invariance (the same
recording as 16-bit PCM and as mu-law matches), shift detection via the
offset vote, negative controls, determinism, and the constellation's
local rules — signals synthesized independently with numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import audio_fp as AF

from tests.test_audio_formats import write_wav_raw
from tests.test_audio_video_codec import write_wav

audioop = pytest.importorskip("audioop")

RATE = 8000


def _tone_mix(seed: int, n: int = RATE * 2) -> np.ndarray:
    """A melody-like signal: a sequence of two-tone chords with
    per-segment frequencies drawn from the seed (deterministic)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / RATE
    sig = np.zeros(n)
    seg = n // 8
    for k in range(8):
        f1, f2 = rng.integers(300, 3200, size=2)
        sl = slice(k * seg, (k + 1) * seg)
        sig[sl] = 6000 * np.sin(2 * np.pi * f1 * t[sl]) + 4000 * np.sin(
            2 * np.pi * f2 * t[sl]
        )
    sig += rng.normal(0, 120, size=n)  # noise floor
    return np.clip(sig, -32768, 32767).astype(np.int64)


def _pcm_wav(sig: np.ndarray) -> bytes:
    return write_wav(sig[:, None], RATE, bits=16)


def _ulaw_wav(sig: np.ndarray) -> bytes:
    enc = audioop.lin2ulaw(sig.astype("<i2").tobytes(), 2)
    return write_wav_raw(enc, RATE, 7, 1, 8)


def test_transcode_invariance_pcm_vs_ulaw(spark):
    sig = _tone_mix(1)
    df = spark.createDataFrame(
        [(0, bytearray(_pcm_wav(sig))), (1, bytearray(_ulaw_wav(sig))),
         (2, bytearray(_pcm_wav(_tone_mix(99))))],  # a different recording
        "doc_id long, payload binary",
    )
    fps = AF.audio_fingerprint(df)
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in AF.audio_near_dup(fps, min_votes=100).collect()
    }
    assert (0, 1) in pairs  # the transcoded copy is found
    assert pairs[(0, 1)]["offset_frames"] == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_shift_detected_with_its_offset(spark):
    sig = _tone_mix(2)
    shift = AF.HOP * 10  # exactly 10 frames of leading silence
    shifted = np.concatenate([np.zeros(shift, dtype=np.int64), sig])
    df = spark.createDataFrame(
        [(0, bytearray(_pcm_wav(sig))), (1, bytearray(_pcm_wav(shifted)))],
        "doc_id long, payload binary",
    )
    out = AF.audio_near_dup(AF.audio_fingerprint(df), min_votes=100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["offset_frames"] == -10  # doc 0 runs 10 frames ahead


def test_negatives_have_no_consistent_offset(spark):
    rows = [
        (i, bytearray(_pcm_wav(_tone_mix(100 + i)))) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = AF.audio_near_dup(AF.audio_fingerprint(df), min_votes=100).collect()
    assert out == []


def test_fingerprint_determinism_and_shape():
    sig = _tone_mix(3)
    from drill_logfile_plugin_spark.operators.audio import _wav_mono

    _r, mono = _wav_mono(_pcm_wav(sig))
    a = AF._landmarks(AF._constellation(mono))
    b = AF._landmarks(AF._constellation(mono))
    assert a == b and len(a) > 100
    for h, t in a[:50]:
        f1 = h >> 24
        f2 = (h >> 8) & 0xFFFF
        dt = h & 0xFF
        assert 0 <= f1 <= AF.N_FFT // 2 and 0 <= f2 <= AF.N_FFT // 2
        assert 1 <= dt <= AF.FAN_OUT
        assert t >= 0


def test_constellation_min_separation_and_dc_rejection():
    sig = _tone_mix(4)
    from drill_logfile_plugin_spark.operators.audio import _wav_mono

    _r, mono = _wav_mono(_pcm_wav(sig))
    for frame in AF._constellation(mono):
        assert 0 not in frame  # DC zeroed
        peaks = list(frame)
        for i in range(1, len(peaks)):
            assert peaks[i] - peaks[i - 1] >= AF.MIN_BIN_SEP


def _tone_prefixed(seed: int, tone_n: int = RATE) -> np.ndarray:
    """One second of a shared pure tone (the degenerate content) followed
    by a seed-unique two-second melody."""
    t = np.arange(tone_n) / RATE
    tone = (8000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int64)
    return np.concatenate([tone, _tone_mix(seed)])


def test_max_postings_bounds_degenerate_corpus(spark):
    """r9 verdict item: a corpus sharing tonal content piles huge
    posting lists onto a handful of hashes — the self join goes
    quadratic AND every pair 'matches' on the shared tone. The
    max_postings cap drops the hot hashes before the join: the true
    pair (shared melody) still matches at its offset, the tonal false
    pairs disappear, and the join's candidate volume collapses."""
    n_docs = 8
    rows = [
        (i, bytearray(_pcm_wav(_tone_prefixed(7 if i < 2 else 100 + i))))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = AF.audio_fingerprint(df).cache()
    try:
        # the corpus IS degenerate: its hottest hash dwarfs the cap
        hottest = (
            fps.groupBy("fp_hash").count().agg(F.max("count")).first()[0]
        )
        assert hottest > 64

        # without the cap: every doc pair rides the shared tone
        raw = AF.audio_near_dup(fps, min_votes=100).collect()
        assert len(raw) == n_docs * (n_docs - 1) // 2  # all false-positive

        capped = AF.audio_near_dup(fps, min_votes=100, max_postings=64)
        got = capped.collect()
        assert [(r["doc_a"], r["doc_b"], r["offset_frames"]) for r in got] == [
            (0, 1, 0)
        ]

        # join stays bounded: total matched row-pairs shrink by orders
        def total_candidates(max_postings):
            fp = fps
            if max_postings is not None:
                hot = (
                    fp.groupBy("fp_hash")
                    .count()
                    .where(F.col("count") > max_postings)
                    .select("fp_hash")
                )
                fp = fp.join(F.broadcast(hot), "fp_hash", "left_anti")
            a = fp.select(F.col("doc_id").alias("a"), "fp_hash")
            b = fp.select(F.col("doc_id").alias("b"), "fp_hash")
            return (
                a.join(b, "fp_hash").where(F.col("a") < F.col("b")).count()
            )

        assert total_candidates(64) * 10 < total_candidates(None)

        # the hot-set filter is a broadcast anti join in the plan
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan and "Broadcast" in plan

        with pytest.raises(ValueError, match="max_postings"):
            AF.audio_near_dup(fps, max_postings=1)
    finally:
        fps.unpersist()
