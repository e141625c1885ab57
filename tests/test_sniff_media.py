"""Magic-byte media sniffing and the codec="auto" mixed-media lanes.

The mixed-corpus scenario the sniffer exists for: ONE payload column
holding every container the package decodes. Pins: sniff_codec
identifies all nine formats by prefix alone; sniff_media profiles a
mixed frame (unknown magics -> NULL, not errors); decode_media
codec="auto" decodes every image/video row and quarantines audio;
phash_signatures codec="auto" produces ONE signature for the same
pixels shipped in three different containers — cross-format media
dedup in a single pass."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators import multimodal as M

from tests.test_audio_video_codec import _mjpeg_avi, write_wav
from tests.test_pnm_codec import write_pgm, write_ppm
from tests.test_png_codec import encode_png
from tests.test_y4m_codec import write_y4m


def _rng(seed):
    return np.random.default_rng(seed)


def _gray(seed, h=8, w=8):
    return _rng(seed).integers(0, 256, size=(h, w), dtype=np.int64).astype(np.uint8)


def _payloads():
    """One payload per sniffable format, plus the format each must
    sniff as."""
    from tests.test_bmp_codec import _write_bmp
    from tests.test_gif_codec import write_gif
    from tests.test_jpeg_codec import _Q50, encode_jpeg
    from tests.test_tiff_codec import _write_tiff

    g = _gray(1)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    jpeg_payload, _ = encode_jpeg({1: g}, 8, 8, {1: (1, 1)}, _Q50)
    avi_payload, _, _ = _mjpeg_avi(2, 2, 8, 8)
    wav_payload = write_wav(
        _rng(3).integers(-100, 100, size=(50, 1), dtype=np.int64), 8000
    )
    palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    return {
        "png": encode_png(g[:, :, None], color_type=0, filters=[0]),
        "jpeg": jpeg_payload,
        "gif": write_gif([(0, 0, g)], 8, 8, palette),
        "bmp": _write_bmp(rgb),
        "tiff": _write_tiff([g]),
        "pnm": write_pgm(g),
        "y4m": write_y4m([g], chroma="mono"),
        "avi": avi_payload,
        "wav": wav_payload,
    }


def test_sniff_codec_identifies_all_formats():
    for fmt, payload in _payloads().items():
        assert M.sniff_codec(payload) == fmt, fmt
        assert M.SNIFF_KINDS[fmt] in ("image", "video", "audio")


def test_sniff_codec_rejections():
    with pytest.raises(ValueError, match="unrecognized media magic"):
        M.sniff_codec(b"\x00\x01\x02\x03 plain bytes")
    with pytest.raises(ValueError, match="unrecognized media magic"):
        M.sniff_codec(b"P9 2 2 ")  # not a PNM kind
    with pytest.raises(ValueError, match="RIFF container"):
        M.sniff_codec(b"RIFF\x04\x00\x00\x00ACON")  # animated cursor


def test_sniff_media_profiles_mixed_frame(spark):
    pays = _payloads()
    rows = [(i, bytearray(p)) for i, p in enumerate(pays.values())]
    rows.append((99, bytearray(b"no magic here")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.sniff_media(df).collect()}
    for i, fmt in enumerate(pays):
        assert out[i]["media_format"] == fmt
        assert out[i]["media_kind"] == M.SNIFF_KINDS[fmt]
    assert out[99]["media_format"] is None and out[99]["media_kind"] is None
    assert out[99]["n_bytes"] == len(b"no magic here")


def test_decode_media_auto_mixed_frame(spark):
    pays = _payloads()
    rows = [(i, bytearray(p)) for i, p in enumerate(pays.values())]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.decode_media(df, codec="auto").collect()}
    for i, fmt in enumerate(pays):
        if fmt == "wav":
            assert out[i]["media_format"] is None  # audio quarantined
        else:
            assert out[i]["media_format"] == fmt
            assert (out[i]["width"], out[i]["height"]) == (8, 8)


def test_extract_features_auto_matches_per_codec(spark):
    pays = _payloads()
    df = spark.createDataFrame(
        [(0, bytearray(pays["png"])), (1, bytearray(pays["pnm"]))],
        "doc_id long, payload binary",
    )
    auto = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(df, dim=8, codec="auto").collect()
    }
    png_only = {
        r["doc_id"]: r["features"]
        for r in M.extract_features(
            df.where("doc_id = 0"), dim=8, codec="png"
        ).collect()
    }
    assert auto[0] == png_only[0]
    assert auto[1] is not None


def test_phash_auto_cross_container_identity(spark):
    """Same pixels in three containers -> ONE signature via ONE pass."""
    g = _gray(9, 16, 16)
    rows = [
        (0, bytearray(encode_png(g[:, :, None], color_type=0, filters=[0]))),
        (1, bytearray(write_pgm(g))),
        (2, bytearray(write_y4m([g], chroma="mono"))),
        (3, bytearray(write_wav(np.zeros((10, 1), dtype=np.int64), 8000))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sigs = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(df, codec="auto").collect()
    }
    assert sigs[0] == sigs[1] == sigs[2]
    assert 3 not in sigs  # audio skipped: no luma plane


def test_sniff_probe_tier_formats():
    """The sniffer labels the probe-tier formats (metadata-only
    decodable) so a mixed-corpus profile is complete."""
    from tests.test_probe import _webp, build_flac, build_mp3, build_mp4, box

    cases = {
        "mp4": build_mp4(),
        "flac": build_flac(),
        "mp3": build_mp3(id3=True),
        "webp": _webp(b"VP8L", b"\x2f" + (99 | (49 << 14)).to_bytes(4, "little")),
        "avif": box(b"ftyp", b"avif\x00\x00\x00\x00"),
        "heic": box(b"ftyp", b"heic\x00\x00\x00\x00"),
    }
    for fmt, payload in cases.items():
        assert M.sniff_codec(bytes(payload)) == fmt, fmt
        assert M.SNIFF_KINDS[fmt] in ("image", "audio", "video")
    # a bare MP3 frame sync is NOT sniffable (needs probe validation)
    with pytest.raises(ValueError, match="unrecognized"):
        M.sniff_codec(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 64)
    import struct as _struct

    ogg = b"OggS" + b"\x00" * 24
    assert M.sniff_codec(ogg) == "ogg"


def test_orientation_invariant_phash(spark):
    """Rotated/flipped copies (the scanned-document duplicate class)
    band to ONE signature under the dihedral canonical hash — and a
    genuinely different image does not."""
    g = _gray(30, 16, 16)
    variants = [
        g,
        np.rot90(g, 1),
        np.rot90(g, 2),
        np.rot90(g, 3),
        g[:, ::-1],
        np.rot90(g, 1)[:, ::-1],
    ]
    rows = [
        (i, bytearray(encode_png(np.ascontiguousarray(v)[:, :, None],
                                 color_type=0, filters=[0])))
        for i, v in enumerate(variants)
    ]
    rows.append((99, bytearray(encode_png(_gray(31, 16, 16)[:, :, None],
                                          color_type=0, filters=[0]))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sigs = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(
            df, codec="png", orientation_invariant=True
        ).collect()
    }
    assert len({sigs[i] for i in range(6)}) == 1
    assert sigs[99] != sigs[0]
    # plain mode distinguishes orientations (sanity: the flag matters)
    plain = {
        r["doc_id"]: r["sig"]
        for r in M.phash_signatures(df, codec="png").collect()
    }
    assert len({plain[i] for i in range(6)}) > 1
    with pytest.raises(ValueError, match="orientation_invariant"):
        M.phash_signatures(df, codec="raw", orientation_invariant=True)
