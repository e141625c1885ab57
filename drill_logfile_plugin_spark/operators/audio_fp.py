"""Audio landmark fingerprinting: spectral peak-pair hashes (the
Shazam scheme) for content-level audio dedup.

The dedup tier's bridge for AUDIO the way decode-then-aHash bridges
images: byte-level hashing cannot see that the same recording ships as
16-bit PCM in one dump and mu-law in another, but its SPECTRAL PEAKS
survive transcoding, amplitude scaling, and noise. The published
landmark recipe (Wang 2003):

1. **Spectrogram** — short-time FFT over the decoded mono signal
   (Hann window, numpy ``rfft`` per hop — one vectorized batch per
   payload, never per-sample Python);
2. **Constellation** — per frame, the top-``peaks_per_frame``
   magnitude bins with a minimum bin separation (local maxima only:
   a loud broadband burst cannot flood the map);
3. **Landmarks** — each peak (anchor) pairs with peaks in the next
   ``fan_out`` frames inside a target zone; the hash packs
   ``(f_anchor, f_other, dt_frames)`` into one int64 — INTEGER bin
   indexes, so fingerprints are exact join keys, not floats;
4. **Matching** — :func:`audio_near_dup` equi-joins fingerprints on
   the hash (banded candidates, never all-pairs) and votes on the
   OFFSET DELTA ``t_a - t_b``: a true copy's matches agree on one
   delta (time-shifted copies agree on the shift), random hash
   collisions scatter — the offset histogram's peak is the match
   score. Pure DataFrame group-bys after the join.

Scale posture: fingerprinting is an Arrow-batched scan; matching is
one equi join on 8-byte keys + a (pair, delta) partial-agg count —
the MinHash-LSH economics applied to audio.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: default spectrogram geometry: 512-sample window, half-overlap hops
N_FFT = 512
HOP = 256
#: constellation density and pairing zone
PEAKS_PER_FRAME = 3
FAN_OUT = 5
MIN_BIN_SEP = 8

#: Schema produced by audio_fingerprint.
FINGERPRINT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fp_hash", LongType()),
        StructField("t_frame", IntegerType()),
    ]
)


def _constellation(mono, n_fft=N_FFT, hop=HOP, peaks_per_frame=PEAKS_PER_FRAME):
    """Per-frame peak bins of the Hann-windowed magnitude spectrogram:
    a list of int arrays (one per frame), bins sorted ascending."""
    import numpy as np

    x = mono.astype(np.float64)
    n_frames = max(0, (len(x) - n_fft) // hop + 1)
    if n_frames == 0:
        return []
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    mag[:, 0] = 0.0  # DC is amplitude offset, not content
    out = []
    for row in mag:
        picked = []
        order = np.argsort(-row, kind="stable")  # ties break on LOW bin
        for b in order:
            if len(picked) >= peaks_per_frame:
                break
            if row[b] <= 0.0:
                break
            if all(abs(int(b) - p) >= MIN_BIN_SEP for p in picked):
                picked.append(int(b))
        out.append(np.asarray(sorted(picked), dtype=np.int64))
    return out


def _landmarks(constellation, fan_out=FAN_OUT):
    """(hash, t_frame) landmark stream: anchor peaks paired with peaks
    in the next ``fan_out`` frames; hash = f1 << 24 | f2 << 8 | dt."""
    out = []
    n = len(constellation)
    for t in range(n):
        for f1 in constellation[t]:
            for dt in range(1, fan_out + 1):
                if t + dt >= n:
                    break
                for f2 in constellation[t + dt]:
                    out.append(
                        ((int(f1) << 24) | (int(f2) << 8) | dt, t)
                    )
    return out


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
) -> DataFrame:
    """WAV payloads -> landmark rows ``(doc_id, fp_hash, t_frame)``.

    Decodes through the package WAV decoder (every supported format —
    PCM widths, G.711, ADPCM — lands on the same 16-bit scale, which is
    exactly why transcoded copies fingerprint alike). Undecodable
    payloads follow ``on_error`` ("skip" default / "strict")."""
    import pandas as pd

    from .multimodal import _check_on_error

    _check_on_error(on_error, allowed=("skip", "strict"))
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it):
        from .audio import _wav_mono

        for pdf in it:
            ids, hashes, ts = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _rate, mono = _wav_mono(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    continue
                for h, t in _landmarks(_constellation(mono)):
                    ids.append(doc_id)
                    hashes.append(h)
                    ts.append(t)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fp_hash": pd.Series(hashes, dtype="int64"),
                    "t_frame": pd.Series(ts, dtype="int32"),
                }
            )

    return narrow.mapInPandas(batches, FINGERPRINT_SCHEMA)


def audio_near_dup(
    fingerprints: DataFrame,
    min_votes: int = 64,
    max_postings: int | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs from a fingerprint table: equi join on
    the landmark hash, then the offset-consistency vote — matches of a
    true copy agree on ONE ``t_a - t_b`` delta (a shifted copy agrees
    on the shift), so the max per-delta count is the score. Returns
    ``(doc_a, doc_b, offset_frames, votes)`` for pairs whose best
    delta gathers ``min_votes`` agreeing landmarks. Calibrate
    ``min_votes`` to content: tonal material collides more (few
    distinct peaks), so its noise floor sits higher than speech —
    measured on the test fixtures, true copies score ~60x the best
    random-pair delta.

    ``max_postings`` is the hot-hash cap (standard Shazam practice): a
    degenerate corpus — silence, black frames, tonal content — piles a
    huge posting list onto a handful of hashes, turning the self join
    quadratic in exactly the way the banding economics exist to avoid.
    Hashes whose corpus-wide posting count exceeds the cap are dropped
    BEFORE the join; they carry no discriminative signal (every doc has
    them), so true pairs keep matching on their distinctive landmarks
    while the join's per-key fan-out stays bounded at
    ``max_postings²``. The cap is computed with one map-side-combined
    count and applied as a broadcast anti join (the hot set is tiny by
    construction). Default None preserves exact behavior; production
    corpora should set it to a small multiple of the expected copy
    count (e.g. 64 x expected replicas).

    Plan shape: one self equi join on the 8-byte hash (candidates =
    landmark collisions, never all-pairs), one (pair, delta)
    partial-agg count, one per-pair max — the LSH-banding economics.
    """
    if max_postings is not None:
        if max_postings < 2:
            raise ValueError(
                f"max_postings must be >= 2 (a pair needs two postings), "
                f"got {max_postings}"
            )
        hot = (
            fingerprints.groupBy("fp_hash")
            .agg(F.count(F.lit(1)).alias("_postings"))
            .where(F.col("_postings") > max_postings)
            .select("fp_hash")
        )
        fingerprints = fingerprints.join(
            F.broadcast(hot), "fp_hash", "left_anti"
        )
    a = fingerprints.select(
        F.col("doc_id").alias("doc_a"),
        "fp_hash",
        F.col("t_frame").alias("t_a"),
    )
    b = fingerprints.select(
        F.col("doc_id").alias("doc_b"),
        "fp_hash",
        F.col("t_frame").alias("t_b"),
    )
    votes = (
        a.join(b, "fp_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", (F.col("t_a") - F.col("t_b")).alias("offset_frames"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = (
        votes.groupBy("doc_a", "doc_b")
        .agg(F.max(F.struct("votes", "offset_frames")).alias("best"))
        .select(
            "doc_a",
            "doc_b",
            F.col("best.offset_frames").alias("offset_frames"),
            F.col("best.votes").alias("votes"),
        )
    )
    return best.where(F.col("votes") >= min_votes)
