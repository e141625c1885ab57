"""WAV audio decoder (stdlib + numpy) for the multimodal tier.

Real audio bytes behind the same Spark-side shape the image codecs
prove: RIFF container parse, then sample decode across the WAV format
codes that dominate real corpora —

* format 1  — integer PCM at 8 (unsigned), 16, 24, 32 bits;
* format 3  — IEEE float PCM (float32/float64);
* format 6  — A-law companded 8-bit (ITU-T G.711, telephony corpora);
* format 7  — mu-law companded 8-bit (G.711, North-American telephony);
* format 17 — IMA/DVI ADPCM 4-bit block-coded (the classic low-rate
  speech archive format);
* format 2  — Microsoft ADPCM 4-bit block-coded (the other legacy
  Windows speech format), including custom predictor-coefficient
  tables carried in the fmt extension;
* format 0xFFFE — WAVE_FORMAT_EXTENSIBLE, the mandatory wrapper for
  >2-channel or >16-bit files, unwrapped to whichever base code its
  SubFormat GUID names.

Everything decodes to ONE amplitude scale — the signed 16-bit range —
so every downstream feature/window lane sees comparable magnitudes
regardless of the container's width:

* 8-bit unsigned is recentred and scaled up (``(v - 128) << 8``);
* 24/32-bit integer PCM is arithmetic-shifted down (``>> 8`` / ``>> 16``
  — floor semantics, deterministic, pinned in tests);
* float is clipped to [-1, 1] and rounded half-to-even to
  ``x * 32767`` (numpy's one rounding mode, bit-stable across runs);
* G.711 and ADPCM expand to 16-bit linear by definition.

The tier's standard guards hold: malformed bytes raise ValueError,
genuinely absent capabilities (GSM 6.10, MPEG layers) raise
NotImplementedError at the documented plug-in points,
and header-derived sizes are bounded before allocation (untrusted
input).

Integer PCM is LOSSLESS, so the pytest discipline is even stronger than
the image codecs': the independent in-test writer round-trips samples
EXACTLY, bit for bit, across widths/channels/odd-length data chunks.
The G.711 tables are pinned against ``audioop`` (an independent CPython
implementation of the same ITU tables) over the complete 256-code
domain; the ADPCM block decoders (IMA and MS) are each pinned against a
loop-by-definition in-test reference fed by an independent in-test
encoder.

No reference counterpart: the reference plugin is text-only
(LogRecordReader.java:125); LLM-pipeline extension tier.
"""

from __future__ import annotations

import struct

#: decoded sample-count bound (frames x channels) — a 40-byte header
#: must not be able to demand a multi-GiB allocation. 2^26 samples is
#: ~11 minutes of 48 kHz stereo, far above fixture scope.
_WAV_MAX_SAMPLES = 1 << 26

#: WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail: every registered wave
#: format shares this 14-byte suffix after the 2-byte format code.
_EXTENSIBLE_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"

_FMT_PCM = 1
_FMT_MS_ADPCM = 2
_FMT_FLOAT = 3
_FMT_ALAW = 6
_FMT_ULAW = 7
_FMT_IMA_ADPCM = 17
_FMT_EXTENSIBLE = 0xFFFE


def _g711_ulaw_table():
    """256-entry mu-law -> 16-bit linear table (ITU-T G.711).

    The textbook expansion: complement, split into sign/segment/mantissa,
    rebuild ``((mantissa << 3) + 0x84) << segment`` and re-subtract the
    bias. Pinned code-for-code against ``audioop.ulaw2lin`` in tests.
    """
    import numpy as np

    codes = np.arange(256, dtype=np.int32) ^ 0xFF  # transmitted inverted
    mant = codes & 0x0F
    seg = (codes & 0x70) >> 4
    t = ((mant << 3) + 0x84) << seg
    return np.where(codes & 0x80, 0x84 - t, t - 0x84).astype(np.int32)


def _g711_alaw_table():
    """256-entry A-law -> 16-bit linear table (ITU-T G.711); pinned
    against ``audioop.alaw2lin`` over the complete domain."""
    import numpy as np

    codes = np.arange(256, dtype=np.int32) ^ 0x55  # even-bit inversion
    mant = codes & 0x0F
    seg = (codes & 0x70) >> 4
    t = mant << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(codes & 0x80, t, -t).astype(np.int32)


#: IMA ADPCM step-size table (89 entries) and index-adjust table —
#: the published DVI/IMA constants, shared by every implementation.
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_expand_nibble(nibble: int, predictor: int, index: int):
    """One IMA ADPCM step: (nibble, state) -> (sample, state'). The
    shift-add reconstruction (step>>3 rounding term) per the IMA spec —
    NOT the approximate multiply — so decoders agree bit-for-bit."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_ADJUST[nibble & 7]))
    return predictor, index


def _ima_adpcm_decode(data: bytes, n_channels: int, block_align: int):
    """Decode WAV IMA ADPCM data to an (n_frames, n_channels) int32 array.

    Block layout (Microsoft WAV mapping of IMA ADPCM): per channel a
    4-byte header (int16 initial predictor — emitted as the block's
    first sample — uint8 step index, uint8 reserved), then the nibble
    stream in 4-byte words interleaved channel by channel, low nibble
    first, 8 samples per channel per word group. A short final block
    decodes to however many whole word groups it carries.
    """
    import numpy as np

    header = 4 * n_channels
    if block_align <= header or (block_align - header) % (4 * n_channels):
        raise ValueError("IMA ADPCM block alignment inconsistent with channels")
    out = [[] for _ in range(n_channels)]
    for bstart in range(0, len(data) - header + 1, block_align):
        block = data[bstart : bstart + block_align]
        preds, idxs = [], []
        for c in range(n_channels):
            pred, idx, _rsvd = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(idx)
            out[c].append(pred)  # header predictor IS the first sample
        for gstart in range(header, len(block) - 4 * n_channels + 1, 4 * n_channels):
            for c in range(n_channels):
                for byte in block[gstart + 4 * c : gstart + 4 * (c + 1)]:
                    for nib in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_expand_nibble(
                            nib, preds[c], idxs[c]
                        )
                        out[c].append(preds[c])
    if not out[0]:
        raise ValueError("IMA ADPCM data shorter than one block header")
    return np.stack(
        [np.asarray(ch, dtype=np.int32) for ch in out], axis=1
    )


#: MS-ADPCM adaptation table (indexed by the unsigned nibble) and the
#: seven standard predictor-coefficient pairs — the published format
#: constants every implementation shares.
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def _ms_adpcm_decode(data: bytes, n_channels: int, block_align: int, coefs):
    """Decode WAV MS-ADPCM data to an (n_frames, n_channels) int32 array.

    Block layout per the format spec: per-channel uint8 predictor
    indexes, per-channel int16 initial deltas, per-channel int16
    sample1 then sample2 (sample2 is the OLDER sample and is emitted
    first), then the 4-bit error stream — one nibble per channel in
    channel order, high nibble first. Reconstruction:
    ``pred = (s1*c1 + s2*c2) >> 8; sample = clamp(pred + delta*e)``
    with the signed nibble ``e`` and
    ``delta' = max(16, (adapt[nibble]*delta) >> 8)``.
    """
    import numpy as np

    header = 7 * n_channels  # 1 + 2 + 2 + 2 bytes per channel
    if block_align <= header:
        raise ValueError("MS-ADPCM block alignment too small for its header")
    out = [[] for _ in range(n_channels)]
    for bstart in range(0, len(data) - header + 1, block_align):
        block = data[bstart : bstart + block_align]
        preds, deltas, s1, s2 = [], [], [], []
        for c in range(n_channels):
            pidx = block[c]
            if pidx >= len(coefs):
                raise ValueError(
                    f"MS-ADPCM predictor index {pidx} exceeds the "
                    f"coefficient table ({len(coefs)} entries)"
                )
            preds.append(coefs[pidx])
        off = n_channels
        for c in range(n_channels):
            (d,) = struct.unpack_from("<h", block, off + 2 * c)
            deltas.append(d if d else 16)
        off += 2 * n_channels
        for c in range(n_channels):
            (v,) = struct.unpack_from("<h", block, off + 2 * c)
            s1.append(v)
        off += 2 * n_channels
        for c in range(n_channels):
            (v,) = struct.unpack_from("<h", block, off + 2 * c)
            s2.append(v)
        off += 2 * n_channels
        for c in range(n_channels):
            out[c].append(s2[c])  # older first
            out[c].append(s1[c])
        ch = 0
        for byte in block[off:]:
            for nib in (byte >> 4, byte & 0x0F):
                e = nib - 16 if nib >= 8 else nib
                c1, c2 = preds[ch]
                pred = (s1[ch] * c1 + s2[ch] * c2) >> 8
                sample = max(-32768, min(32767, pred + deltas[ch] * e))
                s2[ch], s1[ch] = s1[ch], sample
                deltas[ch] = max(16, (_MS_ADAPT[nib] * deltas[ch]) >> 8)
                out[ch].append(sample)
                ch = (ch + 1) % n_channels
    if not out[0]:
        raise ValueError("MS-ADPCM data shorter than one block header")
    n = min(len(x) for x in out)
    return np.stack(
        [np.asarray(x[:n], dtype=np.int32) for x in out], axis=1
    )


def _wav_chunks(payload: bytes):
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) != size:
            raise ValueError("truncated WAV chunk")
        yield cid, data
        pos += 8 + size + (size & 1)  # chunks are word-aligned (pad byte)


def _unwrap_extensible(fmt_body: bytes, audio_format: int) -> int:
    """Resolve WAVE_FORMAT_EXTENSIBLE to its SubFormat's base code."""
    if audio_format != _FMT_EXTENSIBLE:
        return audio_format
    if len(fmt_body) < 40:
        raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk truncated")
    guid = fmt_body[24:40]
    if guid[2:] != _EXTENSIBLE_GUID_TAIL:
        raise NotImplementedError(
            "WAVE_FORMAT_EXTENSIBLE SubFormat GUID is not a registered "
            "wave format (vendor codecs are not decodable here)"
        )
    return struct.unpack("<H", guid[:2])[0]


def _wav_decode(payload: bytes):
    """Decode a WAV to ``(sample_rate, samples)`` — ``samples`` an
    (n_frames, n_channels) int32 array in the signed 16-bit range
    (see the module docstring for the per-format scaling rules)."""
    import numpy as np

    fmt = None
    fmt_body = b""
    data = None
    fact_frames = None
    for cid, body in _wav_chunks(payload):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            (
                audio_format,
                n_channels,
                sample_rate,
                _byte_rate,
                block_align,
                bits,
            ) = struct.unpack("<HHIIHH", body[:16])
            fmt = (audio_format, n_channels, sample_rate, block_align, bits)
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            # spec-required for non-PCM: the true frame count, which
            # trims the block-padding tail of coded formats
            (fact_frames,) = struct.unpack("<I", body[:4])
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, block_align, bits = fmt
    if n_channels == 0 or sample_rate == 0:
        raise ValueError("WAV with zero channels or sample rate")
    audio_format = _unwrap_extensible(fmt_body, audio_format)

    if audio_format == _FMT_MS_ADPCM:
        if bits != 4:
            raise ValueError("MS-ADPCM WAV must declare 4 bits per sample")
        if len(data) * 2 > _WAV_MAX_SAMPLES:
            raise ValueError(
                f"WAV sample count exceeds the decoder bound ({_WAV_MAX_SAMPLES})"
            )
        # the fmt extension may carry a custom coefficient table:
        # cbSize @16, samplesPerBlock @18, numCoef @20, pairs from @22
        coefs = _MS_COEFS
        if len(fmt_body) >= 22:
            (n_coef,) = struct.unpack_from("<H", fmt_body, 20)
            if n_coef and len(fmt_body) >= 22 + 4 * n_coef:
                coefs = tuple(
                    struct.unpack_from("<hh", fmt_body, 22 + 4 * i)
                    for i in range(n_coef)
                )
        samples = _ms_adpcm_decode(data, n_channels, block_align, coefs)
        if fact_frames is not None and fact_frames < len(samples):
            samples = samples[:fact_frames]
        return int(sample_rate), samples

    if audio_format == _FMT_IMA_ADPCM:
        if bits != 4:
            raise ValueError("IMA ADPCM WAV must declare 4 bits per sample")
        # bound BEFORE decoding: <= 2 samples per data byte
        if len(data) * 2 > _WAV_MAX_SAMPLES:
            raise ValueError(
                f"WAV sample count exceeds the decoder bound ({_WAV_MAX_SAMPLES})"
            )
        samples = _ima_adpcm_decode(data, n_channels, block_align)
        if fact_frames is not None and fact_frames < len(samples):
            samples = samples[:fact_frames]
        return int(sample_rate), samples

    if audio_format == _FMT_PCM:
        if bits not in (8, 16, 24, 32):
            raise NotImplementedError(
                f"WAV {bits}-bit integer PCM not supported (8/16/24/32-bit)"
            )
    elif audio_format == _FMT_FLOAT:
        if bits not in (32, 64):
            raise ValueError("IEEE-float WAV must declare 32 or 64 bits")
    elif audio_format in (_FMT_ALAW, _FMT_ULAW):
        if bits != 8:
            raise ValueError("G.711 WAV must declare 8 bits per sample")
    else:
        raise NotImplementedError(
            f"WAV format {audio_format} not supported by the built-in "
            "decoder (PCM/float/A-law/mu-law/IMA-ADPCM/MS-ADPCM; GSM and "
            "MPEG layers are the plug-in points)"
        )
    bytes_per = bits // 8
    if block_align != n_channels * bytes_per:
        raise ValueError("WAV block alignment inconsistent with format")
    n_frames = len(data) // block_align
    if n_frames * n_channels > _WAV_MAX_SAMPLES:
        raise ValueError(
            f"WAV sample count exceeds the decoder bound ({_WAV_MAX_SAMPLES})"
        )
    usable = n_frames * block_align
    raw = data[:usable]
    if audio_format == _FMT_FLOAT:
        f = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
        with np.errstate(invalid="ignore"):
            f = np.nan_to_num(f.astype(np.float64), nan=0.0)
        a = np.rint(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int32)
    elif audio_format == _FMT_ULAW:
        a = _g711_ulaw_table()[np.frombuffer(raw, dtype=np.uint8)]
    elif audio_format == _FMT_ALAW:
        a = _g711_alaw_table()[np.frombuffer(raw, dtype=np.uint8)]
    elif bits == 8:
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
        a = (a - 128) << 8  # unsigned 8-bit -> signed 16-bit range
    elif bits == 16:
        a = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        full = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        full = np.where(full & 0x800000, full - (1 << 24), full)
        a = full >> 8  # arithmetic shift to the 16-bit scale (floor)
    else:  # 32-bit integer PCM
        a = np.frombuffer(raw, dtype="<i4").astype(np.int64) >> 16
        a = a.astype(np.int32)
    out = a.reshape(n_frames, n_channels)
    if (
        audio_format != _FMT_PCM
        and fact_frames is not None
        and fact_frames < len(out)
    ):
        out = out[:fact_frames]
    return int(sample_rate), out


def _wav_mono(payload: bytes):
    """(sample_rate, mono int32 samples): channel mean, the scale-free
    input the feature/window lanes consume."""
    rate, samples = _wav_decode(payload)
    return rate, samples.mean(axis=1).astype("int32")
