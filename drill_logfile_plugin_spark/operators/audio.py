"""WAV/PCM audio decoder (stdlib + numpy) for the multimodal tier.

Real audio bytes behind the same Spark-side shape the image codecs
prove: RIFF container parse, PCM sample decode (8-bit unsigned / 16-bit
signed little-endian, mono or multi-channel), with the tier's standard
guards — malformed bytes raise ValueError, genuinely absent
capabilities (float PCM, 24/32-bit, compressed formats) raise
NotImplementedError at the documented plug-in points, and header-derived
sizes are bounded before allocation (untrusted input).

PCM is LOSSLESS, so the pytest discipline is even stronger than the
image codecs': the independent in-test writer round-trips samples
EXACTLY, bit for bit, across widths/channels/odd-length data chunks.

No reference counterpart: the reference plugin is text-only
(LogRecordReader.java:125); LLM-pipeline extension tier.
"""

from __future__ import annotations

import struct

#: decoded sample-count bound (frames x channels) — a 40-byte header
#: must not be able to demand a multi-GiB allocation. 2^26 samples is
#: ~11 minutes of 48 kHz stereo, far above fixture scope.
_WAV_MAX_SAMPLES = 1 << 26


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


def _wav_decode(payload: bytes):
    """Decode a PCM WAV to ``(sample_rate, samples)`` — ``samples`` an
    (n_frames, n_channels) int32 array of raw PCM values (8-bit
    unsigned payloads recentred to signed, scaled to 16-bit range so
    feature lanes see one amplitude scale)."""
    import numpy as np

    fmt = None
    data = None
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
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, block_align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format {audio_format} not supported by the built-in "
            "decoder (PCM only; float/ADPCM are the plug-in points)"
        )
    if bits not in (8, 16):
        raise NotImplementedError(
            f"WAV {bits}-bit PCM not supported (8/16-bit only; 24/32-bit "
            "are the plug-in points)"
        )
    if n_channels == 0 or sample_rate == 0:
        raise ValueError("WAV with zero channels or sample rate")
    bytes_per = bits // 8
    if block_align != n_channels * bytes_per:
        raise ValueError("WAV block alignment inconsistent with format")
    n_frames = len(data) // block_align
    if n_frames * n_channels > _WAV_MAX_SAMPLES:
        raise ValueError(
            f"WAV sample count exceeds the decoder bound ({_WAV_MAX_SAMPLES})"
        )
    usable = n_frames * block_align
    if bits == 8:
        a = np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int32)
        a = (a - 128) << 8  # unsigned 8-bit -> signed 16-bit range
    else:
        a = np.frombuffer(data[:usable], dtype="<i2").astype(np.int32)
    return int(sample_rate), a.reshape(n_frames, n_channels)


def _wav_mono(payload: bytes):
    """(sample_rate, mono int32 samples): channel mean, the scale-free
    input the feature/window lanes consume."""
    rate, samples = _wav_decode(payload)
    return rate, samples.mean(axis=1).astype("int32")
