"""Extended WAV format lanes: G.711 mu-law/A-law, IEEE float, 24/32-bit
PCM, IMA ADPCM, WAVE_FORMAT_EXTENSIBLE, and the ``fact``-chunk trim.

Independence discipline:

* the G.711 expansion tables are pinned code-for-code over the COMPLETE
  256-value domain against ``audioop`` — an independent CPython C
  implementation of the same ITU-T tables — and the WAV lanes are fed by
  ``audioop.lin2ulaw``/``lin2alaw`` (independent encoders);
* the IMA ADPCM lane is fed by an independent in-test ENCODER written
  from the published IMA/DVI spec whose own reconstruction stream is the
  expected decode (an ADPCM decoder is correct iff it tracks the
  encoder's predictor state bit-for-bit);
* integer PCM and float lanes recompute the documented scaling rule by
  hand on raw numpy buffers.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators import audio as A

audioop = pytest.importorskip("audioop")


# --- independent writers -----------------------------------------------------


def write_wav_raw(
    data: bytes,
    rate: int,
    fmt: int,
    nc: int,
    bits: int,
    block_align: int | None = None,
    extensible: bool = False,
    extra: bytes = b"",
    fact: int | None = None,
) -> bytes:
    """Spec-shaped WAV writer over a raw data payload, optionally wrapped
    in WAVE_FORMAT_EXTENSIBLE, optionally carrying a fact chunk."""
    block = block_align if block_align is not None else nc * bits // 8
    if extensible:
        sub = struct.pack("<H", fmt) + A._EXTENSIBLE_GUID_TAIL
        fmtc = (
            struct.pack("<HHIIHH", 0xFFFE, nc, rate, rate * block, block, bits)
            + struct.pack("<HHI", 22, bits, 0)
            + sub
        )
    else:
        fmtc = struct.pack("<HHIIHH", fmt, nc, rate, rate * block, block, bits) + extra
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
    if fact is not None:
        body += b"fact" + struct.pack("<II", 4, fact)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ima_encode(samples: np.ndarray, groups_per_block: int):
    """Independent IMA ADPCM encoder (published spec): returns
    (data_bytes, block_align, samples_per_block, reconstruction) — the
    reconstruction is what a bit-exact decoder MUST emit."""
    nf, nc = samples.shape
    spb = 1 + 8 * groups_per_block
    block_align = 4 * nc + 4 * nc * groups_per_block
    pred = [0] * nc
    idx = [0] * nc
    data = bytearray()
    recon = np.zeros_like(samples, dtype=np.int32)
    f = 0
    while f < nf:
        blk_n = min(spb, nf - f)
        for c in range(nc):
            pred[c] = int(samples[f, c])
            recon[f, c] = pred[c]
            data += struct.pack("<hBB", pred[c], idx[c], 0)
        pos = 1
        while pos < blk_n:
            for c in range(nc):
                nibs = []
                for s in range(8):
                    target = (
                        int(samples[f + pos + s, c])
                        if pos + s < blk_n
                        else pred[c]  # pad nibbles aim at the current pred
                    )
                    step = A._IMA_STEPS[idx[c]]
                    diff = target - pred[c]
                    nib = 8 if diff < 0 else 0
                    diff = abs(diff)
                    if diff >= step:
                        nib |= 4
                        diff -= step
                    if diff >= step >> 1:
                        nib |= 2
                        diff -= step >> 1
                    if diff >= step >> 2:
                        nib |= 1
                    pred[c], idx[c] = A._ima_expand_nibble(nib, pred[c], idx[c])
                    if pos + s < blk_n:
                        recon[f + pos + s, c] = pred[c]
                    nibs.append(nib)
                for k in range(0, 8, 2):
                    data.append(nibs[k] | (nibs[k + 1] << 4))
            pos += 8
        f += blk_n
    return bytes(data), block_align, spb, recon


def _rng(seed):
    return np.random.default_rng(seed)


# --- G.711 tables: complete-domain pin against audioop ------------------------


def test_ulaw_table_matches_audioop_all_256():
    ref = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2")
    assert np.array_equal(A._g711_ulaw_table(), ref.astype(np.int32))


def test_alaw_table_matches_audioop_all_256():
    ref = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2")
    assert np.array_equal(A._g711_alaw_table(), ref.astype(np.int32))


# --- WAV lanes ----------------------------------------------------------------


def test_wav_ulaw_mono_via_audioop_encoder():
    lin = _rng(1).integers(-32768, 32768, size=400, dtype=np.int64).astype("<i2")
    enc = audioop.lin2ulaw(lin.tobytes(), 2)
    rate, out = A._wav_decode(write_wav_raw(enc, 8000, 7, 1, 8))
    ref = np.frombuffer(audioop.ulaw2lin(enc, 2), dtype="<i2")
    assert rate == 8000
    assert np.array_equal(out, ref.astype(np.int32).reshape(-1, 1))


def test_wav_alaw_stereo_via_audioop_encoder():
    lin = _rng(2).integers(-32768, 32768, size=400, dtype=np.int64).astype("<i2")
    enc = audioop.lin2alaw(lin.tobytes(), 2)
    rate, out = A._wav_decode(write_wav_raw(enc, 16000, 6, 2, 8))
    ref = np.frombuffer(audioop.alaw2lin(enc, 2), dtype="<i2")
    assert np.array_equal(out, ref.astype(np.int32).reshape(-1, 2))


def test_wav_float32_clip_and_round():
    f = _rng(3).uniform(-1.3, 1.3, size=301).astype("<f4")  # out-of-range too
    rate, out = A._wav_decode(write_wav_raw(f.tobytes(), 44100, 3, 1, 32))
    ref = np.rint(np.clip(f.astype(np.float64), -1, 1) * 32767.0)
    assert np.array_equal(out, ref.astype(np.int32).reshape(-1, 1))


def test_wav_float64_and_nan_to_zero():
    f = _rng(4).uniform(-1, 1, size=64)
    f[7] = np.nan
    rate, out = A._wav_decode(write_wav_raw(f.astype("<f8").tobytes(), 48000, 3, 1, 64))
    ref = np.rint(np.clip(np.nan_to_num(f, nan=0.0), -1, 1) * 32767.0)
    assert np.array_equal(out, ref.astype(np.int32).reshape(-1, 1))


def test_wav_pcm24_arithmetic_shift():
    s = _rng(5).integers(-(1 << 23), 1 << 23, size=(250, 2), dtype=np.int64)
    flat = (s.reshape(-1) & 0xFFFFFF).astype(np.uint32)
    b = np.zeros((flat.size, 3), dtype=np.uint8)
    b[:, 0] = flat & 0xFF
    b[:, 1] = (flat >> 8) & 0xFF
    b[:, 2] = (flat >> 16) & 0xFF
    rate, out = A._wav_decode(write_wav_raw(b.tobytes(), 96000, 1, 2, 24))
    assert np.array_equal(out, (s >> 8).astype(np.int32))  # floor shift


def test_wav_pcm32_and_extensible_wrapper():
    s = _rng(6).integers(-(1 << 31), 1 << 31, size=123, dtype=np.int64)
    raw = s.astype("<i4").tobytes()
    plain = A._wav_decode(write_wav_raw(raw, 22050, 1, 1, 32))
    wrapped = A._wav_decode(write_wav_raw(raw, 22050, 1, 1, 32, extensible=True))
    assert plain[0] == wrapped[0] == 22050
    assert np.array_equal(plain[1], wrapped[1])
    assert np.array_equal(plain[1], (s >> 16).astype(np.int32).reshape(-1, 1))


def test_wav_extensible_g711():
    lin = _rng(7).integers(-32768, 32768, size=100, dtype=np.int64).astype("<i2")
    enc = audioop.lin2ulaw(lin.tobytes(), 2)
    rate, out = A._wav_decode(write_wav_raw(enc, 8000, 7, 1, 8, extensible=True))
    ref = np.frombuffer(audioop.ulaw2lin(enc, 2), dtype="<i2")
    assert np.array_equal(out, ref.astype(np.int32).reshape(-1, 1))


# --- IMA ADPCM ----------------------------------------------------------------


def _smooth(seed, n, nc):
    t = np.arange(n)
    base = (8000 * np.sin(t / 20) + 2000 * np.sin(t / 3)).astype(np.int64)
    chans = [np.roll(base, 7 * c) for c in range(nc)]
    noise = _rng(seed).integers(-300, 300, size=(n, nc), dtype=np.int64)
    return np.clip(np.stack(chans, axis=1) + noise, -32768, 32767)


@pytest.mark.parametrize("nc,groups", [(1, 4), (2, 4), (2, 1)])
def test_wav_ima_adpcm_tracks_encoder_exactly(nc, groups):
    s = _smooth(10 + nc, 1000, nc)
    data, block, spb, recon = ima_encode(s, groups)
    payload = write_wav_raw(
        data, 8000, 17, nc, 4, block_align=block,
        extra=struct.pack("<HH", 2, spb), fact=len(s),
    )
    rate, out = A._wav_decode(payload)
    assert rate == 8000
    assert out.shape == recon.shape  # fact chunk trims the pad tail
    assert np.array_equal(out, recon)


def test_wav_ima_adpcm_without_fact_keeps_pad_tail():
    s = _smooth(20, 1000, 1)
    data, block, spb, recon = ima_encode(s, 4)
    rate, out = A._wav_decode(
        write_wav_raw(data, 8000, 17, 1, 4, block_align=block,
                      extra=struct.pack("<HH", 2, spb))
    )
    # padded to whole 8-sample word groups; the real prefix is exact
    assert len(out) >= len(recon)
    assert np.array_equal(out[: len(recon)], recon)


def test_wav_ima_adpcm_rejections():
    s = _smooth(21, 100, 1)
    data, block, spb, _ = ima_encode(s, 1)
    ok = write_wav_raw(data, 8000, 17, 1, 4, block_align=block,
                       extra=struct.pack("<HH", 2, spb))
    # wrong bits-per-sample
    bad = bytearray(ok)
    at = bad.index(b"fmt ") + 8
    bad[at + 14 : at + 16] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="4 bits"):
        A._wav_decode(bytes(bad))
    # block_align not a whole number of 4-byte channel words
    bad2 = bytearray(ok)
    bad2[at + 12 : at + 14] = struct.pack("<H", block + 3)
    with pytest.raises(ValueError, match="block alignment"):
        A._wav_decode(bytes(bad2))
    # step index out of range in a block header
    bad3 = bytearray(ok)
    dat = bad3.index(b"data") + 8
    bad3[dat + 2] = 200
    with pytest.raises(ValueError, match="step index"):
        A._wav_decode(bytes(bad3))


# --- rejection matrix for the new format gates ---------------------------------


def test_wav_unsupported_formats_still_raise():
    s = _rng(30).integers(-100, 100, size=64, dtype=np.int64).astype("<i2")
    raw = s.tobytes()
    with pytest.raises(NotImplementedError, match="format 49"):
        A._wav_decode(write_wav_raw(raw, 8000, 49, 1, 16))  # GSM 6.10
    # float with an integer width is malformed, not a plug-in point
    with pytest.raises(ValueError, match="32 or 64"):
        A._wav_decode(write_wav_raw(raw, 8000, 3, 1, 16))
    # G.711 with a non-8-bit width is malformed
    with pytest.raises(ValueError, match="8 bits"):
        A._wav_decode(write_wav_raw(raw, 8000, 7, 1, 16))
    # extensible wrapper with a vendor GUID
    sub = struct.pack("<H", 1) + b"\xde\xad" + A._EXTENSIBLE_GUID_TAIL[2:]
    fmtc = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0)
        + sub
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    with pytest.raises(NotImplementedError, match="GUID"):
        A._wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
    # truncated extensible fmt chunk
    fmtc_short = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    body2 = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc_short)) + fmtc_short
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        A._wav_decode(b"RIFF" + struct.pack("<I", len(body2)) + body2)


def test_wav_bomb_guard_applies_to_new_lanes():
    # an ADPCM data chunk whose nibble count would exceed the bound —
    # rejected BEFORE decode allocates anything
    huge = (1 << 25) + 8
    fmtc = struct.pack("<HHIIHH", 17, 1, 8000, 4000, 256, 4) + struct.pack(
        "<HH", 2, 505
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"data" + struct.pack("<I", huge) + b"\x00" * huge
    )
    with pytest.raises(ValueError, match="decoder bound"):
        A._wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


# --- Spark lane composition ----------------------------------------------------


def test_decode_audio_lane_handles_g711_and_adpcm(spark):
    from drill_logfile_plugin_spark.operators import multimodal as M

    lin = _rng(40).integers(-32768, 32768, size=800, dtype=np.int64).astype("<i2")
    ulaw = write_wav_raw(audioop.lin2ulaw(lin.tobytes(), 2), 8000, 7, 1, 8)
    s = _smooth(41, 660, 2)
    data, block, spb, _ = ima_encode(s, 4)
    adpcm = write_wav_raw(
        data, 8000, 17, 2, 4, block_align=block,
        extra=struct.pack("<HH", 2, spb), fact=len(s),
    )
    df = spark.createDataFrame(
        [(0, bytearray(ulaw)), (1, bytearray(adpcm))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in M.decode_audio(df).collect()}
    assert (out[0]["n_frames"], out[0]["n_channels"]) == (800, 1)
    assert out[0]["duration_ms"] == 100
    assert (out[1]["n_frames"], out[1]["n_channels"]) == (660, 2)
    assert out[1]["sample_rate"] == 8000


# --- MS-ADPCM -------------------------------------------------------------------


def ms_adpcm_encode(samples: np.ndarray, samples_per_block: int, pidx: int = 0):
    """Independent MS-ADPCM encoder (published format spec): fixed
    predictor per block, error quantized by truncating division; returns
    (data_bytes, block_align, reconstruction) — the reconstruction is
    what a bit-exact decoder MUST emit."""
    ADAPT = A._MS_ADAPT
    COEFS = A._MS_COEFS
    nf, nc = samples.shape
    if samples_per_block < 2 or (samples_per_block - 2) % 2:
        raise ValueError("samples_per_block must be even + 2")
    block_align = 7 * nc + ((samples_per_block - 2) * nc) // 2
    c1, c2 = COEFS[pidx]
    data = bytearray()
    recon = np.zeros_like(samples, dtype=np.int32)
    f = 0
    while f < nf:
        blk_n = min(samples_per_block, nf - f)
        if blk_n < 2:
            break  # a block cannot carry fewer than its two seed samples
        s2 = [int(samples[f, c]) for c in range(nc)]
        s1 = [int(samples[f + 1, c]) for c in range(nc)]
        deltas = [16] * nc
        data += bytes([pidx] * nc)
        for c in range(nc):
            data += struct.pack("<h", deltas[c])
        for c in range(nc):
            data += struct.pack("<h", s1[c])
        for c in range(nc):
            data += struct.pack("<h", s2[c])
        for c in range(nc):
            recon[f, c] = s2[c]
            recon[f + 1, c] = s1[c]
        nibs = []
        for pos in range(2, samples_per_block):
            for c in range(nc):
                target = (
                    int(samples[f + pos, c]) if pos < blk_n else s1[c]
                )
                pred = (s1[c] * c1 + s2[c] * c2) >> 8
                e = (target - pred) // deltas[c] if target >= pred else -(
                    (pred - target) // deltas[c]
                )
                e = max(-8, min(7, e))
                nib = e & 0x0F
                sample = max(-32768, min(32767, pred + deltas[c] * e))
                s2[c], s1[c] = s1[c], sample
                deltas[c] = max(16, (ADAPT[nib] * deltas[c]) >> 8)
                if pos < blk_n:
                    recon[f + pos, c] = sample
                nibs.append(nib)
        for k in range(0, len(nibs), 2):
            data.append((nibs[k] << 4) | nibs[k + 1])
        f += blk_n
    return bytes(data), block_align, recon


@pytest.mark.parametrize("nc,pidx", [(1, 0), (2, 0), (1, 4)])
def test_wav_ms_adpcm_tracks_encoder_exactly(nc, pidx):
    s = _smooth(50 + nc + pidx, 1000, nc)
    spb = 32
    data, block, recon = ms_adpcm_encode(s, spb, pidx=pidx)
    extra = struct.pack("<HHH", 4 + 4 * len(A._MS_COEFS), spb, len(A._MS_COEFS))
    for c1, c2 in A._MS_COEFS:
        extra += struct.pack("<hh", c1, c2)
    payload = write_wav_raw(
        data, 11025, 2, nc, 4, block_align=block, extra=extra, fact=len(s)
    )
    rate, out = A._wav_decode(payload)
    assert rate == 11025
    n = min(len(out), len(recon))
    assert np.array_equal(out[:n], recon[:n])
    assert len(out) == len(recon)  # fact trims any pad tail


def test_wav_ms_adpcm_without_coef_table_uses_standard():
    s = _smooth(60, 128, 1)
    data, block, recon = ms_adpcm_encode(s, 32)
    payload = write_wav_raw(data, 8000, 2, 1, 4, block_align=block)
    rate, out = A._wav_decode(payload)
    assert np.array_equal(out[: len(recon)], recon)


def test_wav_ms_adpcm_rejections():
    s = _smooth(61, 64, 1)
    data, block, _ = ms_adpcm_encode(s, 32)
    ok = bytearray(write_wav_raw(data, 8000, 2, 1, 4, block_align=block))
    at = ok.index(b"fmt ") + 8
    bad_bits = bytearray(ok)
    bad_bits[at + 14 : at + 16] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="4 bits"):
        A._wav_decode(bytes(bad_bits))
    # predictor index beyond the coefficient table
    bad_pred = bytearray(ok)
    dat = bad_pred.index(b"data") + 8
    bad_pred[dat] = 7  # standard table has 7 entries: indexes 0..6
    with pytest.raises(ValueError, match="predictor index"):
        A._wav_decode(bytes(bad_pred))
    # block_align smaller than the per-channel header
    bad_block = bytearray(ok)
    bad_block[at + 12 : at + 14] = struct.pack("<H", 6)
    with pytest.raises(ValueError, match="block alignment too small"):
        A._wav_decode(bytes(bad_block))
