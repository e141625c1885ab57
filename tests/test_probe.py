"""Media probing (header-only MP4/MP3/FLAC metadata): pinned against
independent in-test writers that pack the container headers per each
published spec, including 64-bit MP4 boxes, v0/v1 mvhd layouts,
ID3v2-prefixed MP3 with a Xing VBR header, the CBR estimate fallback,
FLAC STREAMINFO bit packing, and the Spark lane."""

from __future__ import annotations

import struct

import pytest

from drill_logfile_plugin_spark.operators import probe as P


# --- independent writers -------------------------------------------------------


def box(btype: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(duration_s=10, timescale=600, w=640, h=360, v1=False, large=False):
    if v1:
        mvhd = (
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">IQ", timescale, duration_s * timescale)
            + b"\x00" * 80
        )
    else:
        mvhd = (
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">II", timescale, duration_s * timescale)
            + b"\x00" * 80
        )
    tkhd_v0 = b"\x00" * 4 + b"\x00" * 72 + struct.pack(">II", w << 16, h << 16)
    audio_tkhd = b"\x00" * 4 + b"\x00" * 72 + struct.pack(">II", 0, 0)
    moov = (
        box(b"mvhd", mvhd)
        + box(b"trak", box(b"tkhd", audio_tkhd))
        + box(b"trak", box(b"tkhd", tkhd_v0))
    )
    return (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"moov", moov, large=large)
        + box(b"mdat", b"\x00" * 32)
    )


def mp3_frame_bytes(bitrate_idx=9, with_xing=False, n_frames=0) -> bytes:
    """One MPEG1 Layer3 44100 Hz stereo frame (independent header
    assembly): 0xFF 0xFB then bitrate/samplerate nibbles."""
    b2 = (bitrate_idx << 4) | (0 << 2) | 0  # 44100, no padding
    hdr = bytes([0xFF, 0xFB, b2, 0x00])  # stereo (channel mode 0)
    bitrate = P._MP3_BITRATES[(0, 3)][bitrate_idx]
    flen = 1152 // 8 * bitrate * 1000 // 44100
    body = bytearray(flen - 4)
    if with_xing:
        side = 32  # MPEG1 stereo
        at = side  # offset within body (body starts after the 4 hdr bytes)
        body[at : at + 4] = b"Xing"
        body[at + 4 : at + 8] = struct.pack(">I", 1)  # FRAMES flag
        body[at + 8 : at + 12] = struct.pack(">I", n_frames)
    return hdr + bytes(body)


def build_mp3(n_frames=5, with_xing=False, id3=False) -> bytes:
    frames = [mp3_frame_bytes(with_xing=with_xing, n_frames=n_frames)]
    frames += [mp3_frame_bytes() for _ in range(n_frames - 1)]
    payload = b"".join(frames)
    if id3:
        tag_body = b"\x00" * 100
        # syncsafe length 100 = 0x00 0x00 0x00 0x64
        payload = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + tag_body + payload
    return payload


def build_flac(rate=44100, channels=2, bits=16, total=441000) -> bytes:
    packed = (
        (rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total
    )
    info = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    hdr = bytes([0x80]) + len(info).to_bytes(3, "big")  # last-block STREAMINFO
    return b"fLaC" + hdr + info


# --- MP4 ------------------------------------------------------------------------


@pytest.mark.parametrize("v1", [False, True])
@pytest.mark.parametrize("large", [False, True])
def test_mp4_duration_and_dims(v1, large):
    meta = P._probe_mp4(build_mp4(duration_s=95, v1=v1, large=large))
    assert meta["duration_ms"] == 95_000
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["media_kind"] == "video"
    assert meta["duration_exact"] is True


def test_mp4_audio_only_track():
    payload = build_mp4(w=0, h=0)
    meta = P._probe_mp4(payload)
    assert meta["media_kind"] == "audio"
    assert meta["width"] is None


def test_mp4_rejections():
    with pytest.raises(ValueError, match="ftyp"):
        P._probe_mp4(b"\x00\x00\x00\x08freeXXXX")
    good = build_mp4()
    with pytest.raises(ValueError, match="escapes the payload"):
        P._probe_mp4(good[:-20])
    no_moov = box(b"ftyp", b"isom") + box(b"mdat", b"\x00" * 8)
    with pytest.raises(ValueError, match="moov"):
        P._probe_mp4(no_moov)


# --- MP3 ------------------------------------------------------------------------


def test_mp3_xing_exact_duration():
    n = 50
    meta = P._probe_mp3(build_mp3(n_frames=n, with_xing=True))
    assert meta["duration_exact"] is True
    assert meta["duration_ms"] == (n * 1152 * 1000) // 44100
    assert meta["sample_rate"] == 44100
    assert meta["n_channels"] == 2
    assert meta["bitrate_kbps"] == 128


def test_mp3_cbr_estimate_and_id3_skip():
    payload = build_mp3(n_frames=10, id3=True)
    meta = P._probe_mp3(payload)
    assert meta["duration_exact"] is False
    audio_bytes = len(payload) - 110  # ID3 header+body
    assert meta["duration_ms"] == (audio_bytes * 8) // 128


def test_mp3_sync_validation_rejects_lone_sync():
    # 0xFF 0xFB then garbage: the "next frame" check must fail it
    with pytest.raises(ValueError, match="validated frame sync"):
        P._probe_mp3(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 500)


# --- FLAC -----------------------------------------------------------------------


def test_flac_streaminfo():
    meta = P._probe_flac(build_flac(rate=48000, channels=1, bits=24, total=96000))
    assert meta["duration_ms"] == 2000
    assert meta["sample_rate"] == 48000
    assert meta["n_channels"] == 1
    assert meta["bitrate_kbps"] == 24  # bits-per-sample column
    assert meta["duration_exact"] is True


def test_flac_rejections():
    with pytest.raises(ValueError, match="fLaC"):
        P._probe_flac(b"OggS not flac")
    bad = bytearray(build_flac())
    bad[4] = 0x81  # first block claims type 1 (padding)
    with pytest.raises(ValueError, match="STREAMINFO"):
        P._probe_flac(bytes(bad))


# --- router + Spark lane ---------------------------------------------------------


def test_probe_payload_routing():
    assert P.probe_payload(build_mp4())["media_format"] == "mp4"
    assert P.probe_payload(build_mp3())["media_format"] == "mp3"
    assert P.probe_payload(build_flac())["media_format"] == "flac"
    with pytest.raises(ValueError, match="probe-tier"):
        P.probe_payload(b"%PDF- not media")


def test_truncated_payloads_raise_valueerror_not_struct_error():
    """r9 ADVICE fix: truncated MP4/MP3/AVIF payloads used to leak
    struct.error/IndexError past probe_media's (ValueError,
    NotImplementedError) quarantine and abort the whole job. Every
    unpack is now bounds-checked and the dispatcher maps residual
    struct.error/IndexError to ValueError."""
    mvhd = struct.pack(">I", 9) + b"mvhd" + b"\x01"  # v1, 1 body byte
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    trunc_mp4 = ftyp + moov

    # MPEG1 Layer3 128 kbps 44100 stereo frame, Xing tag at the very
    # end so the flags word is missing
    trunc_mp3 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32 + b"Xing"

    # AVIF whose meta box declares a largesize that is absent
    ftyp_a = struct.pack(">I", 16) + b"ftyp" + b"avif" + b"\x00" * 4
    trunc_avif = ftyp_a + struct.pack(">I", 1) + b"meta"

    # tkhd body cut before the 16.16 width/height fields
    tkhd = struct.pack(">I", 10) + b"tkhd" + b"\x00\x00"
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    mvhd_ok = struct.pack(">I", 8 + 24) + b"mvhd" + b"\x00" * 12 + struct.pack(
        ">II", 1000, 5000
    )
    moov2 = struct.pack(">I", 8 + len(mvhd_ok) + len(trak)) + b"moov" + mvhd_ok + trak
    trunc_tkhd = ftyp + moov2

    for payload in (trunc_mp4, trunc_mp3, trunc_avif, trunc_tkhd):
        with pytest.raises(ValueError):
            P.probe_payload(payload)


def test_probe_media_quarantines_truncated_rows(spark):
    """One malformed row must not abort the lane under on_error='null'."""
    mvhd = struct.pack(">I", 9) + b"mvhd" + b"\x01"
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    rows = [
        (0, bytearray(build_mp4(duration_s=3))),
        (1, bytearray(ftyp + moov)),  # struct-error bait pre-fix
        (2, bytearray(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32 + b"Xing")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in P.probe_media(df, on_error="null").collect()}
    assert out[0]["media_format"] == "mp4"
    assert out[1]["media_format"] is None
    assert out[2]["media_format"] is None
    assert {r["doc_id"] for r in P.probe_media(df, on_error="skip").collect()} == {0}


def test_probe_media_lane(spark):
    rows = [
        (0, bytearray(build_mp4(duration_s=7))),
        (1, bytearray(build_mp3(n_frames=20, with_xing=True))),
        (2, bytearray(build_flac())),
        (3, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in P.probe_media(df).collect()}
    assert out[0]["media_format"] == "mp4" and out[0]["duration_ms"] == 7000
    assert out[1]["media_format"] == "mp3" and out[1]["duration_exact"]
    assert out[2]["media_format"] == "flac" and out[2]["sample_rate"] == 44100
    assert out[3]["media_format"] is None  # quarantined
    # the curation filter this tier exists for: duration gating
    # mp4 7 s and flac 10 s pass; the ~0.5 s mp3 drops
    kept = P.probe_media(df, on_error="skip").where("duration_ms >= 5000")
    assert {r["doc_id"] for r in kept.collect()} == {0, 2}


# --- WebP / AVIF / Ogg (r8 probe extensions) --------------------------------------


def _webp(fourcc: bytes, body: bytes) -> bytes:
    chunk = fourcc + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_all_three_layouts():
    vp8x = _webp(b"VP8X", b"\x00\x00\x00\x00" + (639).to_bytes(3, "little") + (359).to_bytes(3, "little"))
    assert P.probe_payload(vp8x)["width"] == 640
    assert P.probe_payload(vp8x)["height"] == 360
    bits = (99) | (49 << 14)  # 100 x 50 minus-one packed
    vp8l = _webp(b"VP8L", b"\x2f" + struct.pack("<I", bits))
    m = P.probe_payload(vp8l)
    assert (m["width"], m["height"]) == (100, 50)
    vp8 = _webp(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00\x00")
    m2 = P.probe_payload(vp8)
    assert (m2["width"], m2["height"], m2["media_kind"]) == (320, 240, "image")
    with pytest.raises(ValueError, match="start code"):
        P._probe_webp(_webp(b"VP8 ", b"\x00" * 12))


def test_avif_ispe_dims():
    ispe = box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 1024, 768))
    meta = box(b"meta", b"\x00\x00\x00\x00" + box(b"iprp", box(b"ipco", ispe)))
    payload = box(b"ftyp", b"avif\x00\x00\x00\x00") + meta
    m = P.probe_payload(payload)
    assert (m["media_format"], m["width"], m["height"]) == ("avif", 1024, 768)
    heic = box(b"ftyp", b"heic\x00\x00\x00\x00") + meta
    assert P.probe_payload(heic)["media_format"] == "heic"
    no_ispe = box(b"ftyp", b"avif\x00\x00\x00\x00") + box(
        b"meta", b"\x00\x00\x00\x00" + box(b"iprp", box(b"ipco", b""))
    )
    with pytest.raises(ValueError, match="ispe"):
        P.probe_payload(no_ispe)


def _ogg_page(packet: bytes, granule: int, seq: int, header_type=0) -> bytes:
    nsegs = len(packet) // 255 + 1
    segs = bytes([255] * (len(packet) // 255) + [len(packet) % 255])
    hdr = (
        b"OggS\x00" + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", 1)  # serial
        + struct.pack("<I", seq)
        + struct.pack("<I", 0)  # crc (unchecked by the prober)
        + bytes([nsegs]) + segs
    )
    return hdr + packet


def test_ogg_opus_duration_from_last_granule():
    head = b"OpusHead\x01\x02\x38\x01" + struct.pack("<I", 48000) + b"\x00\x00\x00"
    pages = _ogg_page(head, 0, 0) + _ogg_page(b"\x00" * 100, 96000, 1) + _ogg_page(
        b"\x00" * 50, 144000, 2, header_type=4
    )
    m = P.probe_payload(pages)
    assert m["media_format"] == "opus"
    assert m["duration_ms"] == 3000  # 144000 granules at 48 kHz
    assert m["n_channels"] == 2
    assert m["sample_rate"] == 48000


def test_ogg_vorbis_and_rejections():
    vid = b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([2]) + struct.pack("<I", 44100) + b"\x00" * 16
    pages = _ogg_page(vid, 0, 0) + _ogg_page(b"\x00" * 60, 88200, 1, header_type=4)
    m = P.probe_payload(pages)
    assert (m["media_format"], m["sample_rate"], m["duration_ms"]) == (
        "vorbis", 44100, 2000
    )
    with pytest.raises(ValueError, match="neither OpusHead nor vorbis"):
        P._probe_ogg(_ogg_page(b"\x05junk-codec", 0, 0))


# --- WebM / Matroska EBML probe (r9) ----------------------------------------------


def ebml(eid: int, body: bytes, unknown_size: bool = False) -> bytes:
    """Independent EBML writer: ID as-is (IDs carry their marker), size
    as a shortest-form vint (or the all-ones unknown-size form)."""
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    if unknown_size:
        return id_bytes + b"\xff" + body
    size = len(body)
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:
            val = size | (1 << (7 * length))
            return id_bytes + val.to_bytes(length, "big") + body
    raise AssertionError("size too large")


def euint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_webm(doctype=b"webm", duration_ms=12345, scale=1_000_000,
               video=(640, 360), audio=(48000.0, 2),
               unknown_segment_size=False, cluster_bytes=1 << 16) -> bytes:
    header = ebml(0x1A45DFA3, ebml(0x4282, doctype))
    info_body = ebml(0x2AD7B1, euint(scale))
    if duration_ms is not None:
        info_body += ebml(0x4489, struct.pack(">d", float(duration_ms)))
    tracks = b""
    if video:
        tracks += ebml(
            0xAE,
            ebml(0x83, b"\x01")
            + ebml(0xE0, ebml(0xB0, euint(video[0])) + ebml(0xBA, euint(video[1]))),
        )
    if audio:
        tracks += ebml(
            0xAE,
            ebml(0x83, b"\x02")
            + ebml(
                0xE1,
                ebml(0xB5, struct.pack(">f", audio[0]))
                + ebml(0x9F, euint(audio[1])),
            ),
        )
    cluster = ebml(0x1F43B675, b"\xab" * cluster_bytes)  # media bulk: skipped
    seg_body = (
        ebml(0x1549A966, info_body) + ebml(0x1654AE6B, tracks) + cluster
    )
    segment = ebml(0x18538067, seg_body, unknown_size=unknown_segment_size)
    return header + segment


def test_webm_probe_exact_metadata():
    meta = P.probe_payload(build_webm())
    assert meta["media_format"] == "webm"
    assert meta["media_kind"] == "video"
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["duration_ms"] == 12345  # Duration x TimestampScale, exact
    assert meta["sample_rate"] == 48000 and meta["n_channels"] == 2
    assert meta["duration_exact"] is True


def test_webm_probe_variants():
    # matroska doctype refines the format name
    assert P.probe_payload(build_webm(doctype=b"matroska"))["media_format"] == "mkv"
    # audio-only: kind flips
    m = P.probe_payload(build_webm(video=None))
    assert m["media_kind"] == "audio" and m["width"] is None
    # unknown-size Segment (live-stream shape): children parse to EOF
    m = P.probe_payload(build_webm(unknown_segment_size=True))
    assert m["duration_ms"] == 12345
    # no Duration element: dims still probe, duration inexact-null
    m = P.probe_payload(build_webm(duration_ms=None))
    assert m["duration_ms"] is None and m["width"] == 640
    assert m["duration_exact"] is False
    # non-default timescale: 100 us units
    m = P.probe_payload(build_webm(duration_ms=50000, scale=100_000))
    assert m["duration_ms"] == 5000


def test_webm_probe_rejections_and_quarantine(spark):
    with pytest.raises(ValueError, match="DocType"):
        P.probe_payload(ebml(0x1A45DFA3, b"") + ebml(0x18538067, b""))
    with pytest.raises(ValueError, match="DocType"):
        P.probe_payload(build_webm(doctype=b"avi-not-really"))
    with pytest.raises(ValueError):
        # element size escaping the payload
        P.probe_payload(b"\x1a\x45\xdf\xa3\x8f" + b"\x00" * 3)
    # Spark lane: a valid webm beside a truncated one
    rows = [
        (0, bytearray(build_webm())),
        (1, bytearray(build_webm()[:40])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in P.probe_media(df).collect()}
    assert got[0]["media_format"] == "webm"
    assert got[1]["media_format"] is None


def test_webm_sniff_row():
    from drill_logfile_plugin_spark.operators.multimodal import (
        SNIFF_KINDS,
        sniff_codec,
    )

    assert sniff_codec(build_webm()) == "webm"
    assert SNIFF_KINDS["webm"] == "video"
