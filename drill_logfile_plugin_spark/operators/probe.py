"""Media probing: header-only metadata for compressed containers.

The curation step BEFORE decode: a multimodal corpus filters by
duration/resolution/sample-rate long before it pays for (or is even
able to run) full decoding. This module reads CONTAINER METADATA only
— the ffprobe role — for the compressed formats that dominate real
media dumps and whose bitstreams genuinely cannot be decoded
stdlib-grade (plus WebM/Matroska via the r9 EBML walk, and the
WebP/AVIF/HEIC/Ogg lanes below):

* **MP4 / ISO-BMFF** (``ftyp`` at offset 4): top-level box walk
  (64-bit largesize handled), ``moov/mvhd`` timescale+duration (both
  version 0 and 1 layouts), ``trak/tkhd`` 16.16-fixed width/height
  (max across tracks — the video track wins over audio's 0×0);
* **MP3** (ID3v2 tag skipped via its syncsafe length, then the first
  frame sync): version/layer/bitrate/sample-rate decoded from the
  published header tables, VALIDATED by requiring the next frame to
  sync where the first one's length says; duration from the Xing/Info
  frame-count header when present (VBR-exact), else the CBR
  byte-length estimate (documented approximation, flagged via
  ``duration_exact``);
* **FLAC** (``fLaC``): the mandatory STREAMINFO block's bit-packed
  sample rate / channels / bits-per-sample / 36-bit total-sample
  count — duration is exact by definition.

All fields land in ONE schema: ``(doc_id, media_format, media_kind,
width, height, duration_ms, sample_rate, n_channels, bitrate_kbps,
duration_exact, n_bytes)`` — image/audio/video formats the package
fully decodes keep using their decode lanes; probing exists for the
formats beyond them. Guards: box/tag walks are length-checked against
the payload (truncation raises), loop counts bounded.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import struct

_MAX_BOXES = 1 << 16

#: MPEG audio bitrate table (kbps), indexed [version_key][layer][idx].
#: version_key: 0 = MPEG1, 1 = MPEG2/2.5. Layer: 1..3. Index 1..14.
_MP3_BITRATES = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
#: sample rates by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5) and index
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _probe_mp4(payload: bytes):
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp box)")

    def boxes(buf, pos, end, depth=0):
        count = 0
        while pos + 8 <= end:
            count += 1
            if count > _MAX_BOXES or depth > 8:
                raise ValueError("MP4 box walk exceeds the bound")
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("MP4 largesize box truncated")
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                body = pos + 16
            if size < 8 or pos + size > end:
                raise ValueError("MP4 box size escapes the payload")
            yield btype, body, pos + size
            pos += size

    duration_ms = None
    width = height = None
    for btype, body, bend in boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in boxes(payload, body, bend, 1):
            if ctype == b"mvhd":
                if cbody >= len(payload):
                    raise ValueError("MP4 mvhd box truncated")
                ver = payload[cbody]
                if ver == 1:
                    if cbody + 32 > len(payload):
                        raise ValueError("MP4 mvhd v1 truncated")
                    ts, dur = struct.unpack(
                        ">IQ", payload[cbody + 20 : cbody + 32]
                    )
                else:
                    if cbody + 20 > len(payload):
                        raise ValueError("MP4 mvhd v0 truncated")
                    ts, dur = struct.unpack(
                        ">II", payload[cbody + 12 : cbody + 20]
                    )
                if ts:
                    duration_ms = (dur * 1000) // ts
            elif ctype == b"trak":
                for ttype, tbody, _tend in boxes(payload, cbody, cend, 2):
                    if ttype != b"tkhd":
                        continue
                    if tbody >= len(payload):
                        raise ValueError("MP4 tkhd box truncated")
                    ver = payload[tbody]
                    off = tbody + (88 if ver == 1 else 76)
                    if off + 8 > len(payload):
                        raise ValueError("MP4 tkhd dims truncated")
                    w_fx, h_fx = struct.unpack(
                        ">II", payload[off : off + 8]
                    )
                    w, h = w_fx >> 16, h_fx >> 16
                    if w and h:
                        width = max(width or 0, w)
                        height = max(height or 0, h)
    if duration_ms is None:
        raise ValueError("MP4 has no moov/mvhd (streaming fragment?)")
    kind = "video" if width else "audio"
    return {
        "media_format": "mp4",
        "media_kind": kind,
        "width": width,
        "height": height,
        "duration_ms": duration_ms,
        "duration_exact": True,
    }


def _mp3_frame(payload: bytes, pos: int):
    """Parse a frame header at pos: (frame_len, version_bits, layer,
    bitrate_kbps, sample_rate, channels, samples_per_frame) or None."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_bits = (b1 >> 1) & 3  # 3=L1, 2=L2, 1=L3
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vkey = 0 if ver_bits == 3 else 1
    bitrate = _MP3_BITRATES[(vkey, layer)][br_idx]
    rate = _MP3_RATES[ver_bits][sr_idx]
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    if layer == 1:
        spf = 384
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or vkey == 0) else 576
        flen = spf // 8 * bitrate * 1000 // rate + padding
    return flen, ver_bits, layer, bitrate, rate, channels, spf


def _probe_mp3(payload: bytes):
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("MP3 ID3v2 tag truncated")
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)  # syncsafe integer
        pos = 10 + sz
        if pos >= len(payload):
            raise ValueError("MP3 ID3v2 tag swallows the whole payload")
    # scan (bounded) for a VALIDATED frame sync: the next frame must
    # also parse where this frame's length says it starts
    hdr = None
    for scan in range(pos, min(pos + 4096, len(payload) - 4)):
        h = _mp3_frame(payload, scan)
        if h is None:
            continue
        nxt = scan + h[0]
        if nxt + 4 <= len(payload) and _mp3_frame(payload, nxt) is None:
            continue
        pos = scan
        hdr = h
        break
    if hdr is None:
        raise ValueError("MP3 has no validated frame sync")
    flen, ver_bits, layer, bitrate, rate, channels, spf = hdr
    # Xing/Info VBR header sits after the side info: MPEG1 32/17 bytes
    # (stereo/mono), MPEG2(.5) 17/9
    vkey = 0 if ver_bits == 3 else 1
    if vkey == 0:
        side = 32 if channels == 2 else 17
    else:
        side = 17 if channels == 2 else 9
    xing_at = pos + 4 + side
    exact = False
    duration_ms = None
    tag = payload[xing_at : xing_at + 4]
    if tag in (b"Xing", b"Info"):
        if xing_at + 8 > len(payload):
            raise ValueError("MP3 Xing/Info header truncated")
        (flags,) = struct.unpack(">I", payload[xing_at + 4 : xing_at + 8])
        if flags & 1:
            if xing_at + 12 > len(payload):
                raise ValueError("MP3 Xing frame count truncated")
            (n_frames,) = struct.unpack(
                ">I", payload[xing_at + 8 : xing_at + 12]
            )
            duration_ms = (n_frames * spf * 1000) // rate
            exact = True
    if duration_ms is None:
        # CBR estimate over the audio bytes
        duration_ms = ((len(payload) - pos) * 8) // max(1, bitrate)
    return {
        "media_format": "mp3",
        "media_kind": "audio",
        "duration_ms": duration_ms,
        "sample_rate": rate,
        "n_channels": channels,
        "bitrate_kbps": bitrate,
        "duration_exact": exact,
    }


def _probe_flac(payload: bytes):
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC (missing fLaC marker)")
    if len(payload) < 4 + 4 + 34:
        raise ValueError("FLAC STREAMINFO truncated")
    btype = payload[4] & 0x7F
    if btype != 0:
        raise ValueError("FLAC first metadata block is not STREAMINFO")
    info = payload[8 : 8 + 34]
    packed = int.from_bytes(info[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC declares a zero sample rate")
    return {
        "media_format": "flac",
        "media_kind": "audio",
        "duration_ms": (total * 1000) // rate,
        "sample_rate": rate,
        "n_channels": channels,
        "bitrate_kbps": bits,  # bits-per-sample rides this column
        "duration_exact": True,
    }


def _probe_webp(payload: bytes):
    """WebP dimensions from whichever chunk leads: VP8X (extended
    canvas, 24-bit minus-one fields), VP8L (lossless, 14-bit packed),
    or VP8 (lossy keyframe tag + 14-bit dims)."""
    if len(payload) < 25 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    fourcc = payload[12:16]
    body = payload[20:]
    if fourcc == b"VP8X":
        if len(body) < 10:
            raise ValueError("WebP VP8X chunk truncated")
        w = int.from_bytes(body[4:7], "little") + 1
        h = int.from_bytes(body[7:10], "little") + 1
    elif fourcc == b"VP8L":
        if len(body) < 5 or body[0:1] != b"\x2f":
            raise ValueError("WebP VP8L signature missing")
        bits = int.from_bytes(body[1:5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
    elif fourcc == b"VP8 ":
        # lossy keyframe: 3-byte frame tag, 3-byte start code, dims
        if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("WebP VP8 keyframe start code missing")
        w = int.from_bytes(body[6:8], "little") & 0x3FFF
        h = int.from_bytes(body[8:10], "little") & 0x3FFF
    else:
        raise ValueError(f"WebP leading chunk {fourcc!r} unrecognized")
    if not w or not h:
        raise ValueError("WebP declares zero dimensions")
    return {
        "media_format": "webp",
        "media_kind": "image",
        "width": w,
        "height": h,
        "duration_exact": True,
    }


def _probe_avif(payload: bytes):
    """AVIF/HEIC dimensions from the meta/iprp/ipco/ispe property box
    (ISO-BMFF, so the MP4 box walker carries over); the brand in ftyp
    names the format."""
    brand = payload[8:12]
    fmt = "avif" if brand.startswith(b"avif") or brand.startswith(b"avis") else "heic"

    def find(buf, pos, end, btype, depth=0):
        count = 0
        while pos + 8 <= end:
            count += 1
            if count > _MAX_BOXES or depth > 8:
                raise ValueError("MP4 box walk exceeds the bound")
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            t = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("MP4 largesize box truncated")
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                body = pos + 16
            if size < 8 or pos + size > end:
                raise ValueError("MP4 box size escapes the payload")
            if t == btype:
                return body, pos + size
            pos += size
        return None

    meta = find(payload, 0, len(payload), b"meta")
    if meta is None:
        raise ValueError("AVIF/HEIC has no meta box")
    # meta is a FULL box: 4 bytes version/flags before children
    iprp = find(payload, meta[0] + 4, meta[1], b"iprp", 1)
    ipco = iprp and find(payload, iprp[0], iprp[1], b"ipco", 2)
    ispe = ipco and find(payload, ipco[0], ipco[1], b"ispe", 3)
    if not ispe:
        raise ValueError("AVIF/HEIC has no ispe property (no dimensions)")
    if ispe[0] + 12 > len(payload):
        raise ValueError("AVIF/HEIC ispe property truncated")
    w, h = struct.unpack(">II", payload[ispe[0] + 4 : ispe[0] + 12])
    if not w or not h:
        raise ValueError("AVIF/HEIC declares zero dimensions")
    return {
        "media_format": fmt,
        "media_kind": "image",
        "width": w,
        "height": h,
        "duration_exact": True,
    }


#: granule rate per Ogg codec: Opus granules are ALWAYS 48 kHz
_OGG_MAX_PAGES = 1 << 16


def _probe_ogg(payload: bytes):
    """Ogg (Opus/Vorbis) duration from the identification header plus
    the LAST page's granule position (the format's own duration
    convention — granules are PCM sample counts)."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream (missing OggS capture)")
    if len(payload) < 28 + 1:
        raise ValueError("Ogg first page truncated")
    nsegs = payload[26]
    seg_table = payload[27 : 27 + nsegs]
    if len(seg_table) != nsegs:
        raise ValueError("Ogg segment table truncated")
    first = payload[27 + nsegs : 27 + nsegs + sum(seg_table)]
    if first.startswith(b"OpusHead"):
        if len(first) < 12:
            raise ValueError("OpusHead truncated")
        channels = first[9]
        rate = 48000  # Opus granules run at 48 kHz regardless of input
        fmt = "opus"
    elif first[1:7] == b"vorbis" and first[0] == 1:
        if len(first) < 16:
            raise ValueError("Vorbis id header truncated")
        channels = first[11]
        (rate,) = struct.unpack("<I", first[12:16])
        fmt = "vorbis"
    else:
        raise ValueError("Ogg first packet is neither OpusHead nor vorbis id")
    if not rate or not channels:
        raise ValueError("Ogg id header declares zero rate/channels")
    # last granule: scan pages; each page header carries its granule
    granule = 0
    pos = 0
    pages = 0
    n = len(payload)
    while pos + 27 <= n and payload[pos : pos + 4] == b"OggS":
        pages += 1
        if pages > _OGG_MAX_PAGES:
            raise ValueError("Ogg page count exceeds the bound")
        (g,) = struct.unpack("<q", payload[pos + 6 : pos + 14])
        if g > 0:
            granule = g
        ns = payload[pos + 26]
        body = sum(payload[pos + 27 : pos + 27 + ns])
        pos += 27 + ns + body
    return {
        "media_format": fmt,
        "media_kind": "audio",
        "duration_ms": (granule * 1000) // rate,
        "sample_rate": rate,
        "n_channels": channels,
        "duration_exact": True,
    }


#: EBML element ids (Matroska/WebM, RFC 8794 + the Matroska spec)
_EBML_HEADER = 0x1A45DFA3
_EBML_DOCTYPE = 0x4282
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKTYPE = 0x83
_MKV_VIDEO = 0xE0
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_AUDIO = 0xE1
_MKV_SAMPLERATE = 0xB5
_MKV_CHANNELS = 0x9F
_EBML_UNKNOWN = -1  # all-ones size: extends to the parent's end
_EBML_MAX_ELEMENTS = 1 << 16


def _ebml_vint(buf: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) for an EBML variable-length integer. Element
    IDs keep the length-descriptor bit (``keep_marker``); sizes mask it
    and report the all-ones reserved value as unknown."""
    if pos >= len(buf):
        raise ValueError("EBML vint truncated")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("EBML vint with >8 length bytes invalid here")
    length = 9 - b0.bit_length()
    if pos + length > len(buf):
        raise ValueError("EBML vint truncated")
    if keep_marker:
        value = b0
    else:
        value = b0 & ((1 << (8 - length)) - 1)
    for k in range(1, length):
        value = (value << 8) | buf[pos + k]
    if not keep_marker:
        all_ones = (1 << (7 * length)) - 1
        if value == all_ones:
            return _EBML_UNKNOWN, pos + length
    return value, pos + length


def _ebml_children(buf: bytes, pos: int, end: int, budget: list):
    """Yield (element_id, body_start, body_end) for the elements of one
    master element; unknown-size children extend to the parent's end."""
    while pos < end:
        budget[0] += 1
        if budget[0] > _EBML_MAX_ELEMENTS:
            raise ValueError("EBML element count exceeds the bound")
        eid, pos = _ebml_vint(buf, pos, keep_marker=True)
        size, pos = _ebml_vint(buf, pos, keep_marker=False)
        body_end = end if size == _EBML_UNKNOWN else pos + size
        if body_end > end:
            raise ValueError("EBML element escapes its parent")
        yield eid, pos, body_end
        pos = body_end


def _ebml_uint(buf: bytes, start: int, end: int) -> int:
    return int.from_bytes(buf[start:end], "big")


def _ebml_float(buf: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", buf[start:end])[0]
    if n == 8:
        return struct.unpack(">d", buf[start:end])[0]
    raise ValueError(f"EBML float of width {n} invalid")


def _probe_webm(payload: bytes):
    """WebM/Matroska metadata from the EBML header + Segment Info and
    Tracks — Clusters (the media bulk) are SKIPPED by their declared
    size, so the walk is header-only regardless of file size."""
    budget = [0]
    doctype = None
    duration = None
    timescale = 1_000_000  # Matroska default: 1 ms in nanoseconds
    width = height = None
    sample_rate = None
    channels = None
    has_video = has_audio = False
    for eid, b0, b1 in _ebml_children(payload, 0, len(payload), budget):
        if eid == _EBML_HEADER:
            for cid, c0, c1 in _ebml_children(payload, b0, b1, budget):
                if cid == _EBML_DOCTYPE:
                    doctype = payload[c0:c1].rstrip(b"\x00").decode(
                        "ascii", errors="replace"
                    )
        elif eid == _MKV_SEGMENT:
            for cid, c0, c1 in _ebml_children(payload, b0, b1, budget):
                if cid == _MKV_INFO:
                    for iid, i0, i1 in _ebml_children(
                        payload, c0, c1, budget
                    ):
                        if iid == _MKV_TIMESCALE:
                            timescale = _ebml_uint(payload, i0, i1)
                        elif iid == _MKV_DURATION:
                            duration = _ebml_float(payload, i0, i1)
                elif cid == _MKV_TRACKS:
                    for tid, t0, t1 in _ebml_children(
                        payload, c0, c1, budget
                    ):
                        if tid != _MKV_TRACKENTRY:
                            continue
                        ttype = None
                        for fid, f0, f1 in _ebml_children(
                            payload, t0, t1, budget
                        ):
                            if fid == _MKV_TRACKTYPE:
                                ttype = _ebml_uint(payload, f0, f1)
                            elif fid == _MKV_VIDEO:
                                for vid, v0, v1 in _ebml_children(
                                    payload, f0, f1, budget
                                ):
                                    if vid == _MKV_PIXELW:
                                        w = _ebml_uint(payload, v0, v1)
                                        width = max(width or 0, w)
                                    elif vid == _MKV_PIXELH:
                                        h = _ebml_uint(payload, v0, v1)
                                        height = max(height or 0, h)
                            elif fid == _MKV_AUDIO:
                                for aid, a0, a1 in _ebml_children(
                                    payload, f0, f1, budget
                                ):
                                    if aid == _MKV_SAMPLERATE:
                                        sample_rate = int(
                                            _ebml_float(payload, a0, a1)
                                        )
                                    elif aid == _MKV_CHANNELS:
                                        channels = _ebml_uint(
                                            payload, a0, a1
                                        )
                        if ttype == 1:
                            has_video = True
                        elif ttype == 2:
                            has_audio = True
                # Clusters and everything else: skipped by size
    if doctype is None:
        raise ValueError("EBML stream has no DocType (not WebM/Matroska)")
    if doctype not in ("webm", "matroska"):
        raise ValueError(f"EBML DocType {doctype!r} unrecognized")
    if not has_video and not has_audio and width is None:
        raise ValueError("WebM/Matroska has no Tracks metadata")
    duration_ms = None
    if duration is not None and duration >= 0:
        duration_ms = int(duration * timescale / 1_000_000)
    return {
        "media_format": "webm" if doctype == "webm" else "mkv",
        "media_kind": "video" if (has_video or width) else "audio",
        "width": width,
        "height": height,
        "duration_ms": duration_ms,
        "sample_rate": sample_rate,
        "n_channels": channels,
        "duration_exact": duration is not None,
    }


def probe_payload(payload: bytes) -> dict:
    """Route by magic to the right prober; ValueError on unknown or
    malformed payloads.

    Every prober bounds-checks before unpacking, and this dispatcher
    additionally maps any residual ``struct.error``/``IndexError`` from
    a truncated payload to ``ValueError`` so ``probe_media``'s per-row
    quarantine contract (``on_error='null'/'skip'``) can never be
    escaped by one malformed row.
    """
    try:
        return _probe_dispatch(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated/malformed media payload: {exc}") from exc


def _probe_dispatch(payload: bytes) -> dict:
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        brand = payload[8:12]
        if brand[:4] in (b"avif", b"avis", b"heic", b"heix", b"mif1"):
            return _probe_avif(payload)
        return _probe_mp4(payload)
    if payload[:4] == b"fLaC":
        return _probe_flac(payload)
    if payload[:4] == b"OggS":
        return _probe_ogg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return _probe_webp(payload)
    if payload[:3] == b"ID3" or (
        len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return _probe_mp3(payload)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return _probe_webm(payload)
    raise ValueError("unrecognized probe-tier media magic")


def probe_media(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "null",
):
    """Spark lane: compressed-media payloads -> header-only metadata
    (one row per payload; see module doc for the schema). Arrow-batched
    with the tier's quarantine contract."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .multimodal import _check_on_error

    _check_on_error(on_error)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_format", StringType()),
            StructField("media_kind", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("duration_ms", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("bitrate_kbps", IntegerType()),
            StructField("duration_exact", BooleanType()),
            StructField("n_bytes", LongType()),
        ]
    )
    cols = (
        "media_format", "media_kind", "width", "height", "duration_ms",
        "sample_rate", "n_channels", "bitrate_kbps", "duration_exact",
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {c: [] for c in ("doc_id", *cols, "n_bytes")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    meta = probe_payload(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "strict":
                        raise
                    if on_error == "skip":
                        continue
                    meta = {}
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(p))
                for c in cols:
                    out[c].append(meta.get(c))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "media_format": pd.Series(out["media_format"], dtype="object"),
                    "media_kind": pd.Series(out["media_kind"], dtype="object"),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "duration_ms": pd.Series(out["duration_ms"], dtype="Int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.Series(out["n_channels"], dtype="Int32"),
                    "bitrate_kbps": pd.Series(out["bitrate_kbps"], dtype="Int32"),
                    "duration_exact": pd.Series(
                        out["duration_exact"], dtype="object"
                    ),
                    "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
