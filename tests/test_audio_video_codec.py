"""Audio (WAV/PCM) and video (MJPEG-AVI) codec contracts.

Same discipline as the image codecs: independent in-test WRITERS (a RIFF
WAV writer, a RIFF AVI muxer whose frames come from the independent
baseline-JPEG encoder) produce containers the package decoders must
read back — WAV sample recovery is EXACT (PCM is lossless), AVI frame
streams decode frame-for-frame with container-derived timestamps. Then
the Spark lanes (decode_audio / extract_features / frame_sample) run
end-to-end with the quarantine contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import audio as A
from drill_logfile_plugin_spark.operators import jpeg as J
from drill_logfile_plugin_spark.operators import multimodal as M
from drill_logfile_plugin_spark.operators import video as V

from tests.test_jpeg_codec import _Q50, _gray_jpeg, encode_jpeg

# --- independent writers -----------------------------------------------------


def write_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """samples: (n_frames, n_channels) ints — int16 values for bits=16,
    0..255 for bits=8."""
    nf, nc = samples.shape
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        data = samples.astype(np.uint8).tobytes()
    block = nc * bits // 8
    fmt = struct.pack("<HHIIHH", 1, nc, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def write_avi(frames: list[bytes], w: int, h: int, us_per_frame: int) -> bytes:
    """Minimal spec-shaped MJPG AVI: hdrl(avih) + movi(00dc...)."""

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b"")
        )

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rng(seed):
    return np.random.default_rng(seed)


# --- WAV decoder contract ----------------------------------------------------


def test_wav_16bit_stereo_exact_roundtrip():
    s = _rng(1).integers(-32768, 32768, size=(1000, 2), dtype=np.int64)
    rate, out = A._wav_decode(write_wav(s, 44100, bits=16))
    assert rate == 44100
    assert np.array_equal(out, s.astype(np.int32))


def test_wav_8bit_mono_recentred():
    s = _rng(2).integers(0, 256, size=(333, 1), dtype=np.int64)
    rate, out = A._wav_decode(write_wav(s, 8000, bits=8))
    assert rate == 8000
    assert np.array_equal(out, ((s - 128) << 8).astype(np.int32))


def test_wav_odd_data_chunk_pad_byte():
    # 8-bit mono with odd sample count: data chunk needs a pad byte and
    # a trailing chunk after it must still parse
    s = _rng(3).integers(0, 256, size=(7, 1), dtype=np.int64)
    payload = write_wav(s, 16000, bits=8)
    payload += b"LIST" + struct.pack("<I", 4) + b"INFO"
    rate, out = A._wav_decode(payload)
    assert (rate, out.shape) == (16000, (7, 1))


def test_wav_rejections():
    with pytest.raises(ValueError, match="RIFF"):
        A._wav_decode(b"\xff\xd8 not a wav at all")
    s = _rng(4).integers(-100, 100, size=(10, 1), dtype=np.int64)
    good = bytearray(write_wav(s, 8000))
    fmt_at = good.index(b"fmt ") + 8
    gsm = bytearray(good)
    gsm[fmt_at : fmt_at + 2] = struct.pack("<H", 49)  # GSM 6.10
    with pytest.raises(NotImplementedError, match="plug-in points"):
        A._wav_decode(bytes(gsm))
    # IEEE float declared at an integer width: malformed, and 24-bit
    # declared without fixing block_align: inconsistent
    ieee16 = bytearray(good)
    ieee16[fmt_at : fmt_at + 2] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="32 or 64"):
        A._wav_decode(bytes(ieee16))
    b24 = bytearray(good)
    b24[fmt_at + 14 : fmt_at + 16] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="block alignment"):
        A._wav_decode(bytes(b24))
    with pytest.raises(ValueError, match="truncated"):
        A._wav_decode(bytes(good[:-6]))
    # bomb guard: header claims a huge data chunk it cannot back
    bomb = bytearray(good)
    data_at = bomb.index(b"data") + 4
    bomb[data_at : data_at + 4] = struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError, match="truncated"):
        A._wav_decode(bytes(bomb))


# --- AVI decoder contract ----------------------------------------------------


def _mjpeg_avi(seed, n_frames, h, w, us=40000):
    frames = []
    planes = []
    for i in range(n_frames):
        plane = _rng(seed + i).integers(0, 256, size=(h, w), dtype=np.uint8)
        payload, _ = encode_jpeg({1: plane}, w, h, {1: (1, 1)}, _Q50)
        frames.append(payload)
        planes.append(plane)
    return write_avi(frames, w, h, us), frames, planes


def test_avi_mjpeg_frames_and_dims():
    payload, frames, _ = _mjpeg_avi(10, 5, 16, 24)
    w, h, us, got = V._avi_decode(payload)
    assert (w, h, us) == (24, 16, 40000)
    assert got == frames  # byte-exact frame extraction
    # every frame decodes through the package JPEG decoder
    for f in got:
        ww, hh, _ = J._jpeg_decode(f)
        assert (ww, hh) == (24, 16)


def test_avi_rejections():
    with pytest.raises(ValueError, match="AVI"):
        V._avi_decode(b"RIFF\x04\x00\x00\x00WAVE")
    payload, frames, _ = _mjpeg_avi(11, 2, 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        V._avi_decode(payload[:-10])
    # non-JPEG frame payloads: a real but non-MJPG stream
    not_mjpg = write_avi([b"\x00\x01\x02\x03"], 8, 8, 40000)
    with pytest.raises(NotImplementedError, match="MJPG"):
        V._avi_decode(not_mjpg)


# --- Spark lanes --------------------------------------------------------------


@pytest.fixture(scope="module")
def av_frame(spark):
    s16 = _rng(20).integers(-32768, 32768, size=(1600, 2), dtype=np.int64)
    wav = write_wav(s16, 16000, bits=16)  # 100 ms stereo
    avi, _, _ = _mjpeg_avi(21, 6, 13, 7, us=20000)  # 50 fps
    rows = [
        (0, bytearray(wav), bytearray(avi)),
        (1, bytearray(b"RIFFjunk"), bytearray(b"RIFFjunk")),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, wav binary, avi binary"
    )


def test_decode_audio_lane(spark, av_frame):
    out = {
        r["doc_id"]: r
        for r in M.decode_audio(av_frame, payload_col="wav").collect()
    }
    good = out[0]
    assert good["media_format"] == "wav"
    assert good["sample_rate"] == 16000
    assert good["n_channels"] == 2
    assert good["n_frames"] == 1600
    assert good["duration_ms"] == 100
    q = out[1]  # quarantined
    assert q["media_format"] is None and q["sample_rate"] is None


def test_decode_media_avi_lane(spark, av_frame):
    out = {
        r["doc_id"]: r
        for r in M.decode_media(
            av_frame, payload_col="avi", codec="avi"
        ).collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (7, 13)
    assert out[0]["media_format"] == "avi"
    assert out[1]["media_format"] is None
    with pytest.raises(ValueError, match="decode_audio"):
        M.decode_media(av_frame, payload_col="wav", codec="wav")


def test_frame_sample_avi_real_timestamps(spark, av_frame):
    rows = M.frame_sample(
        av_frame, payload_col="avi", codec="avi", every_n=2
    ).collect()
    got = sorted((r["frame_idx"], r["t_ms"]) for r in rows)
    # 6 frames at 20 ms/frame, every 2nd: 0, 2, 4
    assert got == [(0, 0), (2, 40), (4, 80)]
    assert {r["doc_id"] for r in rows} == {0}  # corrupt row skipped


def test_frame_sample_wav_windows(spark, av_frame):
    rows = M.frame_sample(
        av_frame, payload_col="wav", codec="wav", every_n=1
    ).collect()
    # 1600 frames @16 kHz = 100 ms = 4 windows of 25 ms
    got = sorted((r["frame_idx"], r["t_ms"]) for r in rows)
    assert got == [(0, 0), (1, 25), (2, 50), (3, 75)]


def test_extract_features_wav_amplitude_histogram(spark, av_frame):
    dim = 8
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(
            av_frame, payload_col="wav", dim=dim, codec="wav"
        ).collect()
    }
    assert feats[1] is None
    wav_bytes = bytes(
        av_frame.where("doc_id = 0").collect()[0]["wav"]
    )
    _rate, mono = A._wav_mono(wav_bytes)
    bins = np.clip(((mono.astype(np.int64) + 32768) * dim) // 65536, 0, dim - 1)
    hist = np.bincount(bins, minlength=dim) / mono.size
    assert np.allclose(np.asarray(feats[0]), hist)


def test_extract_features_avi_first_frame_luma(spark, av_frame):
    dim = 8
    feats = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(
            av_frame, payload_col="avi", dim=dim, codec="avi"
        ).collect()
    }
    avi_bytes = bytes(av_frame.where("doc_id = 0").collect()[0]["avi"])
    gray = J._jpeg_decode(V._avi_decode(avi_bytes)[3][0])[2]
    hist = np.bincount(
        (gray.ravel().astype(np.int64) * dim) // 256, minlength=dim
    ) / gray.size
    assert np.allclose(np.asarray(feats[0]), hist)


def test_audio_windows_integer_exact(spark):
    """Energy and zero-crossing outputs recompute exactly by hand —
    all-integer DSP, the tier's cross-platform determinism rule."""
    # 8 kHz mono: hop at 25 ms = 200 samples; craft 2.5 windows
    sig = np.zeros((500, 1), dtype=np.int64)
    sig[:200, 0] = 100                      # window 0: constant positive
    sig[200:400, 0] = [(-50) ** 1 if i % 2 else 50 for i in range(200)]
    payload = write_wav(sig, 8000, bits=16)
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {
        r["window_idx"]: r
        for r in M.audio_windows(df, window_ms=25).collect()
    }
    assert set(rows) == {0, 1}  # 100-sample tail dropped
    assert rows[0]["energy"] == 200 * 100 * 100
    assert rows[0]["zero_crossings"] == 0
    assert rows[0]["n_samples"] == 200
    assert rows[1]["energy"] == 200 * 50 * 50
    # alternating signs: a flip at every sample boundary inside window 1
    # plus the boundary flip from window 0's +100 to -50? window 1
    # starts with +50 (i=0 even) ... pattern [50, -50, 50, ...]: flips
    # between consecutive samples = 199, plus boundary sample 199->200
    # (+100 -> +50) no flip
    assert rows[1]["zero_crossings"] == 199
    assert rows[1]["t_ms"] == 25


def test_audio_windows_zero_sign_inherits_previous(spark):
    sig = np.array([[10], [0], [0], [-10], [0], [10], [0], [0]], dtype=np.int64)
    payload = write_wav(sig, 320, bits=16)  # hop = 320*25//1000 = 8
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    )
    r = M.audio_windows(df, window_ms=25).collect()[0]
    # signs after zero-fill: + + + - - + + +  -> flips at 10->-10, -10->10
    assert r["zero_crossings"] == 2
    assert r["energy"] == 100 + 100 + 100


def test_audio_segments_island_detection(spark):
    """Hand-pinned gaps-and-islands: windows with energies
    [high high low low low high] at threshold 50 -> speech(0-1),
    silence(2-4), speech(5); debouncing flips a 1-window blip."""
    rows = [
        (0, i, i * 25, e, 200, 0)
        for i, e in enumerate([900, 800, 10, 5, 7, 700])
    ]
    win = spark.createDataFrame(
        rows,
        "doc_id long, window_idx int, t_ms long, energy long, "
        "n_samples int, zero_crossings int",
    )
    segs = sorted(
        M.audio_segments(win, energy_threshold=50).collect(),
        key=lambda r: r["segment_idx"],
    )
    got = [
        (r["kind"], r["start_ms"], r["end_ms"], r["n_windows"], r["energy"])
        for r in segs
    ]
    assert got == [
        ("speech", 0, 50, 2, 1700),
        ("silence", 50, 125, 3, 22),
        ("speech", 125, None, 1, 700),
    ]

    # debounce: the same series with min_windows=2 reclassifies the
    # final single-window speech island into the silence segment
    segs2 = sorted(
        M.audio_segments(win, energy_threshold=50, min_windows=2).collect(),
        key=lambda r: r["segment_idx"],
    )
    got2 = [(r["kind"], r["start_ms"], r["n_windows"]) for r in segs2]
    assert got2 == [("speech", 0, 2), ("silence", 50, 4)]


def test_audio_segments_end_to_end_from_wav(spark):
    """Composition: real WAV -> audio_windows -> audio_segments."""
    loud = np.full((400, 1), 1000, dtype=np.int64)
    quiet = np.zeros((400, 1), dtype=np.int64)
    sig = np.concatenate([loud, quiet, loud])
    payload = write_wav(sig, 8000, bits=16)  # hop 200 -> 6 windows
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    segs = sorted(
        M.audio_segments(
            M.audio_windows(df, window_ms=25), energy_threshold=0
        ).collect(),
        key=lambda r: r["segment_idx"],
    )
    assert [(r["kind"], r["n_windows"]) for r in segs] == [
        ("speech", 2),
        ("silence", 2),
        ("speech", 2),
    ]
